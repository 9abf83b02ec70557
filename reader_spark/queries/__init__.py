"""Driver-contract query families factored out of __spark_entry__.py.

The driver imports __spark_entry__ only; these modules exist so the entry
file stays a reviewable registry (VERDICT r3 #8) while queries() keeps the
exact same name -> callable mapping.
"""
