"""lsh_rs_spark — PySpark-native near-duplicate detection & clustering engine.

A from-scratch Spark re-expression of the capabilities of ritchie46/lsh-rs
(MinHash / SimHash / SRP locality-sensitive hashing, candidate generation,
exact re-rank, top-k query) extended with the web-scale dedup stages the
north rule requires (banding, skew-guarded pairing, exact verify, connected
components, substring dedup, checkpoint/resume).
"""

from lsh_rs_spark.config import DedupConfig, MIPSConfig, SimHashConfig, SRPConfig

__all__ = ["DedupConfig", "MIPSConfig", "SimHashConfig", "SRPConfig"]
__version__ = "0.2.0"
