"""Residual-encoded PQ A/B (round 12, VERDICT r11 item 3).

Offline numpy mirror of the engine's exact IVFADC chain (the same
instrument class as the round-11 multiprobe-frontier grid): compare
RAW-encoded PQ (the shipped form — subvectors slice the raw embedding)
against RESIDUAL-encoded PQ (the FAISS IVFADC form — subvectors slice
x − coarse_centroid(cell(x)), and the query LUT is built per probed
cell from slice(p − c_cell)) at rerank ∈ {16, 32, 64} and fixed
8 B/vector (M=8, K=256).

Mirrors the engine's determinism contracts exactly so the raw@64 row
reproduces the graded q_adc_recall number: md5-ordered seeds ('cq:' /
'pq:'), 6-dp-rounded Lloyd updates and assignment cosines, smallest-id
tie-breaks, nprobe=4 probed-cell scan (sub-cells collapse to k=1 at
the graded SFs), ADC distance rounded to 6 dp, (d2, neighbor_id)
shortlist order, exact cosine re-rank, (sim desc, neighbor_id) top-K.

Decision rule (VERDICT r11 item 3): adopt residual encoding iff it
holds >= 95% of the coarse-cell ceiling at rerank 16-32; else record
the curve in SURVEY.md §6 and keep the raw form.

Usage: python tools/residual_pq_ab.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import sys

import numpy as np
import pandas as pd

CQ_K = 20
CQ_UPDATES = 2
NPROBE = 4
PQ_M = 8
PQ_SUBDIM = 8
PQ_K = 256
RECALL_K = 10
PANEL = 24
RERANKS = (16, 32, 64)


def _md5(prefix: str, vid: int) -> str:
    return hashlib.md5(f"{prefix}{vid}".encode()).hexdigest()


def _round6(x):
    # mirrors both engines' round(x, 6) shortest-repr double rounding
    return np.round(x, 6)


def _cq_train(ids, X):
    """md5-seeded k-means, CQ_UPDATES rounded Lloyd updates, 6-dp
    rounded cosine assignment, smallest-cell tie-break. Returns
    (centroids dict c->vec, assignment dict vid->c)."""
    order = sorted(range(len(ids)), key=lambda i: (_md5("cq:", ids[i]), ids[i]))
    cents = {c + 1: X[order[c]].copy() for c in range(CQ_K)}

    def assign(cmap):
        keys = sorted(cmap)
        M = np.stack([cmap[c] for c in keys])
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        cos = _round6(Xn @ Mn.T)
        # max rounded cosine, tie -> smallest cell id (keys sorted, and
        # flatnonzero returns the first = smallest index among ties)
        out = {}
        for i in range(len(ids)):
            row = cos[i]
            out[ids[i]] = keys[int(np.flatnonzero(row == row.max())[0])]
        return out

    a = assign(cents)
    for _ in range(CQ_UPDATES):
        newc = {}
        for c in sorted(cents):
            members = [i for i, v in enumerate(ids) if a[v] == c]
            if members:
                newc[c] = _round6(X[members].mean(axis=0))
        cents = newc
        a = assign(cents)
    return cents, a


def _pq_train(ids, V):
    """One rounded Lloyd update from md5 'pq:' seeds over the encoding
    input V (raw embeddings or residuals). Returns (codebook
    cb[s][c] -> subvec, assignment a2[vid][s] -> c)."""
    order = sorted(range(len(ids)), key=lambda i: (_md5("pq:", ids[i]), ids[i]))
    seeds = [V[order[c]] for c in range(PQ_K)]
    cb = {}
    for s in range(PQ_M):
        lo, hi = s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM
        sub = V[:, lo:hi]
        seedm = np.stack([sv[lo:hi] for sv in seeds])
        d2 = ((sub[:, None, :] - seedm[None, :, :]) ** 2).sum(axis=2)
        a1 = np.argmin(d2, axis=1)  # ties: argmin returns smallest idx
        cent1 = {}
        for c in range(PQ_K):
            members = np.flatnonzero(a1 == c)
            if len(members):
                cent1[c + 1] = _round6(sub[members].mean(axis=0))
        cb[s] = cent1
    a2 = {}
    for s in range(PQ_M):
        lo, hi = s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM
        sub = V[:, lo:hi]
        keys = sorted(cb[s])
        centm = np.stack([cb[s][c] for c in keys])
        d2 = ((sub[:, None, :] - centm[None, :, :]) ** 2).sum(axis=2)
        a1 = np.argmin(d2, axis=1)
        for i, v in enumerate(ids):
            a2.setdefault(v, {})[s] = keys[int(a1[i])]
    return cb, a2


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    df = pd.read_parquet(f"{sf}/embeddings.parquet")
    ids = df.vec_id.astype(int).tolist()
    X = np.stack(df.embedding.values).astype(np.float64)
    idx = {v: i for i, v in enumerate(ids)}
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    cents, assign = _cq_train(ids, X)
    panel = sorted(ids, key=lambda v: (_md5("recall:", v), v))[:PANEL]

    # per-probe route: top-NPROBE cells by rounded cosine, tie smallest
    ckeys = sorted(cents)
    Cm = np.stack([cents[c] for c in ckeys])
    Cn = Cm / np.linalg.norm(Cm, axis=1, keepdims=True)
    route = {}
    for p in panel:
        cos = _round6(Xn[idx[p]] @ Cn.T)
        order = sorted(range(len(ckeys)), key=lambda j: (-cos[j], ckeys[j]))
        route[p] = [ckeys[j] for j in order[:NPROBE]]

    members = {}
    for v in ids:
        members.setdefault(assign[v], []).append(v)

    # ground truth: exact top-K per probe over the whole corpus
    truth = {}
    for p in panel:
        sims = Xn @ Xn[idx[p]]
        cand = sorted(
            ((float(sims[idx[n]]), n) for n in ids if n != p),
            key=lambda t: (-t[0], t[1]),
        )
        truth[p] = {n for _, n in cand[:RECALL_K]}

    # scanned posting lists (sub-cells collapse to k=1 at graded SFs)
    scanned = {p: [n for c in route[p] for n in members.get(c, []) if n != p]
               for p in panel}

    # cell ceiling: exact rerank over the whole scan
    ceil_hits = 0
    for p in panel:
        sims = sorted(
            ((float(Xn[idx[n]] @ Xn[idx[p]]), n) for n in scanned[p]),
            key=lambda t: (-t[0], t[1]),
        )
        ceil_hits += len({n for _, n in sims[:RECALL_K]} & truth[p])
    ceiling = ceil_hits / (RECALL_K * PANEL)

    def adc_curve(V, lut_query):
        """V = encoding input; lut_query(p, cell) -> query subvectors."""
        cb, a2 = _pq_train(ids, V)
        out = {}
        for rerank in RERANKS:
            hits = 0
            for p in panel:
                scored = []
                for cell in route[p]:
                    q = lut_query(p, cell)
                    # per-(s, c) LUT for this probe/cell
                    lut = {}
                    for s in range(PQ_M):
                        lo, hi = s * PQ_SUBDIM, (s + 1) * PQ_SUBDIM
                        for c, cv in cb[s].items():
                            lut[(s, c)] = float(((q[lo:hi] - cv) ** 2).sum())
                    for n in members.get(cell, []):
                        if n == p:
                            continue
                        d2 = round(
                            sum(lut[(s, a2[n][s])] for s in range(PQ_M)), 6
                        )
                        scored.append((d2, n))
                scored.sort()
                short = [n for _, n in scored[:rerank]]
                sims = sorted(
                    ((float(Xn[idx[n]] @ Xn[idx[p]]), n) for n in short),
                    key=lambda t: (-t[0], t[1]),
                )
                hits += len({n for _, n in sims[:RECALL_K]} & truth[p])
            out[rerank] = hits / (RECALL_K * PANEL)
        return out

    raw = adc_curve(X, lambda p, cell: X[idx[p]])
    resid = np.stack([X[idx[v]] - cents[assign[v]] for v in ids])
    res = adc_curve(
        resid, lambda p, cell: X[idx[p]] - cents[cell]
    )

    result = {
        "sf": sf,
        "ceiling": round(ceiling, 4),
        "raw": {k: round(v, 4) for k, v in raw.items()},
        "residual": {k: round(v, 4) for k, v in res.items()},
        "adopt_residual": all(
            res[r] >= 0.95 * ceiling for r in (16, 32)
        ),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
