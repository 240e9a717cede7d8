"""(stub — filled in later this round)"""
