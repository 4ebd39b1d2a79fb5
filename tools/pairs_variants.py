"""Pairs-stage plan shootout (round-6 scaling residue, stage_profile pairs
speedup 1.77x at 2->8 — the last sub-linear stage).  Times the within-bucket
pairing alternatives in isolation: the band table (band_idx, band_key,
doc_id) is pre-materialized to parquet ONCE at full parallelism, then each
timed leg persists it in memory so ONLY the pairing plan + shuffle config
differ between variants.

Variants (x shuffle-compression on/off, a separate JVM each — the spill dir
is tmpfs, so compression trades CPU against a RAM->RAM copy):
  current — production ``candidate_pairs``: fold (band_idx, band_key) into
            one xxhash64 long, window-count bucket guard (Exchange + Sort +
            WindowExec), groupBy collect_list reusing the partitioning,
            in-row pair explosion, distinct.
  noguard — same fold/agg/explode/distinct but NO window guard: groupBy
            collect_list directly (ObjectHashAggregate, sort-free) with the
            [2, cap] size filter on the aggregated list.  Output-identical
            (the window count equals the list size); the guard exists only
            to bound a mega-bucket's aggregation buffer, so this measures
            what the WindowExec sort costs.

Each variant reports wall times, the distinct pair count and a bit_xor
checksum of xxhash64(src, dst) — all variants must agree exactly.

Usage: python tools/pairs_variants.py [n_pages] [low_cores] [high_cores] [n_runs]
Reads the cached corpus at /tmp/scaling_corpus_{n_pages} (generate via
tools/scaling_bench.py); taskset/BLAS/tmpfs methodology identical to
tools/scaling_bench.py so numbers are comparable with the stage profile.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREP_SNIPPET = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from lsh_rs_spark.config import PIPELINE_CONFIG as cfg
from lsh_rs_spark.operators import lsh as L

spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.driver.memory", "24g")
    .config("spark.local.dir", "/dev/shm/spark-tmp")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({input!r})
sig = L.signatures(docs, cfg)
L.explode_bands(sig, cfg).write.mode("overwrite").parquet({buckets!r})
spark.stop()
"""

TIMED_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from lsh_rs_spark.config import PIPELINE_CONFIG as cfg
from lsh_rs_spark.operators import lsh as L

cores = {cores}
spark = (SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.sql.shuffle.partitions", str(cores * {parts_factor}))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.shuffle.compress", {compress!r})
    .config("spark.shuffle.spill.compress", {compress!r})
    .config("spark.driver.memory", "12g")
    .config("spark.local.dir", "/dev/shm/spark-tmp")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

buckets = spark.read.parquet({buckets!r}).persist()
buckets.count()


def plan(name):
    if name == "current":
        return L.candidate_pairs(buckets, cfg)
    if name == "noguard":
        folded = buckets.select(
            F.xxhash64("band_idx", "band_key").alias("_bkey"), "doc_id")
        pair_expr = F.explode(F.flatten(F.transform(
            "ds",
            lambda x, i: F.transform(
                F.slice("ds", i + 2, F.size("ds")),
                lambda y: F.struct(F.least(x, y).alias("src"),
                                   F.greatest(x, y).alias("dst"))))))
        return (folded.groupBy("_bkey")
                .agg(F.collect_list("doc_id").alias("ds"))
                .where((F.size("ds") >= 2)
                       & (F.size("ds") <= cfg.max_bucket_size))
                .select(pair_expr.alias("p"))
                .select("p.src", "p.dst")
                .distinct())
    raise ValueError(name)


# no separate warm-up: n_runs >= 2 and we report min, so the first run
# absorbs JIT/codegen warm-up per JVM
out = {{"cores": cores, "compress": {compress!r}, "variants": {{}}}}
for name in ({variants!r}):
    walls, n_pairs, chk = [], None, None
    for _ in range({n_runs}):
        t0 = time.time()
        p = plan(name).localCheckpoint(eager=True)
        walls.append(round(time.time() - t0, 2))
        row = p.agg(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("chk")).collect()[0]
        n_pairs, chk = row.n, row.chk
        p.unpersist()
    out["variants"][name] = {{"walls": walls, "min": min(walls),
                              "n_pairs": n_pairs, "chk": chk}}
    print(f"c{{cores}} compress={{out['compress']}} {{name}}: {{walls}} "
          f"n_pairs={{n_pairs}}", file=sys.stderr)
print("RESULT " + json.dumps(out))
spark.stop()
"""


def run_sub(code: str, cores: int, timeout: int = 3600) -> str:
    os.makedirs("/dev/shm/spark-tmp", exist_ok=True)
    env = dict(os.environ)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        env[var] = "1"
    # executors re-exec python fresh: the repo must be on PYTHONPATH
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    proc = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=timeout, env=env)
    sys.stderr.write(proc.stderr[-1500:] if proc.returncode else "")
    if proc.returncode != 0:
        raise RuntimeError(f"subprocess rc={proc.returncode}:\n"
                           f"{proc.stderr[-3000:]}")
    return proc.stdout


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    input_dir = os.path.join("/tmp", f"scaling_corpus_{n_pages}")
    assert os.path.exists(os.path.join(input_dir, "_SUCCESS")), \
        f"generate the corpus first via tools/scaling_bench.py {n_pages}"
    buckets_dir = os.path.join("/tmp", f"pairs_buckets_{n_pages}")
    if not os.path.exists(os.path.join(buckets_dir, "_SUCCESS")):
        print("prep: materializing band table ...", file=sys.stderr)
        run_sub(PREP_SNIPPET.format(repo=REPO, input=input_dir,
                                    buckets=buckets_dir), 32)

    from scaling_bench import idle_gate

    parts_factor = int(os.environ.get("SCALING_PARTS_FACTOR", "4"))
    variants = ("current", "noguard")
    res: dict = {}
    for cores in (low, high):
        res[str(cores)] = {}
        for compress in ("true", "false"):
            gate = idle_gate(float(os.environ.get(
                "SCALING_GATE_LOADAVG", "2.0")))
            out = run_sub(TIMED_SNIPPET.format(
                repo=REPO, cores=cores, buckets=buckets_dir,
                parts_factor=parts_factor, compress=compress,
                variants=variants, n_runs=n_runs), cores)
            for line in out.splitlines():
                if line.startswith("RESULT "):
                    r = json.loads(line[len("RESULT "):])
                    r["gate"] = gate
                    res[str(cores)][f"compress_{compress}"] = r
                    break
            else:
                raise RuntimeError(f"no RESULT line:\n{out[-2000:]}")
    # cross-variant agreement
    sigs = {(v["n_pairs"], v["chk"])
            for leg in res.values() for r in leg.values()
            for v in r["variants"].values()}
    summary = {
        "metric": "pairs_variant_shootout",
        "n_pages": n_pages, "low_cores": low, "high_cores": high,
        "n_runs": n_runs, "parts_factor": parts_factor,
        "all_variants_identical": len(sigs) == 1,
        "pair_signature": list(sigs)[0] if len(sigs) == 1 else sorted(sigs),
        "runs": res,
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(REPO, "tools", "pairs_variants.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
