"""Relational + training-data operators, all expressed as DataFrame plans.

Everything here is declared with pyspark.sql primitives so Catalyst chooses
the physical strategy (broadcast vs sort-merge, AQE coalescing/skew-split);
Python appears only inside Arrow-batched UDFs where semantics require it.
"""
