"""Memory-ceiling soak: ~4 B-token corpus (4x the billion-token check)
through encode -> write encoded blocks -> decode-only, sampling peak
memory the whole way (not CI — run manually; results recorded in
BASELINE.md).

What it proves: the engine's per-task cost model is flat as corpus size
quadruples AGAIN (969 M -> ~3.9 B tokens) and the whole pipeline fits the
sandbox's 128 GiB ceiling with a wide margin — i.e. the bounded-batch
property (every executor sees a stream of <=1 Mi-token Arrow batches,
never the whole corpus) extrapolates, which is exactly the claim a
10^12-token cluster run rests on.

Phases (each timed, peak memory sampled at 0.5 s throughout):
  1. corpus gen (skipped when present) — same per-source mix as bench.py,
     just 4x the blocks;
  2. encode (scan-parallel auto) -> write encoded blocks to parquet: the
     production ingest path, including the sink;
  3. decode-only x3 over the WRITTEN blocks (parquet -> decode_stats_df
     -> aggregate): the every-epoch read path; rep 1 pays the cold page
     cache, min-of-3 is the engine cost;
  4. compression accounting from the written blocks (byte-stability check
     vs the 969 M / 241 M corpora: 2.520x / 2.350x expected).

Memory metrics reported:
  - peak system used (MemTotal - MemAvailable): the honest "would this
    OOM" number — includes JVM, every Python worker, and non-reclaimable
    kernel state, excludes reclaimable page cache;
  - peak process-tree RSS (sum over java + pyspark daemon/workers at the
    sample instant) and the JVM's own VmHWM at exit;
  - peak /dev/shm/spark-local usage (shuffle/scratch spill — scan-parallel
    encode and the decode path are exchange-free, so this should stay ~0).

Usage: python scripts/soak_memceil.py [tokens_M]   (default 3840)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rle_array_spark import datagen  # noqa: E402
from rle_array_spark.engine import decode_stats_df, encode_df, session  # noqa: E402

ROWS_PER_SOURCE = 120
TOKENS_PER_BLOCK = 930_000  # same empirical figure bench.py uses


# ---------------------------------------------------------------------------
# memory sampler
# ---------------------------------------------------------------------------

def _meminfo_used_gb() -> float:
    total = avail = 0
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemTotal:"):
                total = int(line.split()[1])
            elif line.startswith("MemAvailable:"):
                avail = int(line.split()[1])
    return (total - avail) / 1024 / 1024


def _tree_rss_gb() -> float:
    """Sum RSS over every java / python process on the box (local mode:
    that IS the Spark process tree — one JVM + pyspark daemons/workers)."""
    rss_kb = 0
    for status in glob.glob("/proc/[0-9]*/status"):
        try:
            with open(status) as f:
                name = rss = None
                for line in f:
                    if line.startswith("Name:"):
                        name = line.split()[1]
                    elif line.startswith("VmRSS:"):
                        rss = int(line.split()[1])
                        break
            if name and rss and ("java" in name or "python" in name):
                rss_kb += rss
        except OSError:
            continue
    return rss_kb / 1024 / 1024


def _shm_gb() -> float:
    total = 0
    for root, _dirs, files in os.walk("/dev/shm/spark-local"):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                continue
    return total / 1024**3


def _jvm_vmhwm_gb() -> float:
    best = 0
    for status in glob.glob("/proc/[0-9]*/status"):
        try:
            with open(status) as f:
                txt = f.read()
            if "\nName:\tjava\n" in "\n" + txt or txt.startswith("Name:\tjava"):
                for line in txt.splitlines():
                    if line.startswith("VmHWM:"):
                        best = max(best, int(line.split()[1]))
        except OSError:
            continue
    return best / 1024 / 1024


class MemSampler(threading.Thread):
    def __init__(self, interval: float = 0.5):
        super().__init__(daemon=True)
        self.interval = interval
        self.stop_flag = threading.Event()
        self.peak_used = 0.0
        self.peak_tree = 0.0
        self.peak_shm = 0.0
        self.phase_peaks: dict[str, float] = {}
        self.phase = "init"

    def run(self):
        while not self.stop_flag.is_set():
            used = _meminfo_used_gb()
            tree = _tree_rss_gb()
            shm = _shm_gb()
            self.peak_used = max(self.peak_used, used)
            self.peak_tree = max(self.peak_tree, tree)
            self.peak_shm = max(self.peak_shm, shm)
            self.phase_peaks[self.phase] = max(self.phase_peaks.get(self.phase, 0.0), used)
            self.stop_flag.wait(self.interval)


# ---------------------------------------------------------------------------
# phases
# ---------------------------------------------------------------------------

def ensure_corpus(spark, corpus_dir: str, n_blocks: int, cpus: int) -> None:
    if os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        return
    shutil.rmtree(corpus_dir, ignore_errors=True)

    def gen(iterator):
        for batch in iterator:
            for block_id in batch.column("id").to_pylist():
                yield datagen.generate_block(int(block_id), ROWS_PER_SOURCE)

    (
        spark.range(n_blocks)
        .repartition(cpus * 2)
        .mapInArrow(gen, "doc_id string, tokens array<int>, n_tok int, source string")
        .write.mode("overwrite")
        .parquet(corpus_dir)
    )


def main() -> None:
    tokens_m = int(sys.argv[1]) if len(sys.argv) > 1 else 3840
    n_blocks = max(4, (tokens_m * 1_000_000) // TOKENS_PER_BLOCK)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_dir = f"/tmp/rle_soak_corpus_b{n_blocks}_r{ROWS_PER_SOURCE}"
    blocks_dir = f"/tmp/rle_soak_blocks_b{n_blocks}"

    spark = session("memceil-soak", cores=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sampler = MemSampler()
    sampler.start()
    out: dict = {"tokens_m_requested": tokens_m, "n_blocks": n_blocks, "cpus": cpus}

    sampler.phase = "corpus_gen"
    t0 = time.time()
    ensure_corpus(spark, corpus_dir, n_blocks, cpus)
    out["corpus_gen_s"] = round(time.time() - t0, 1)
    out["corpus_gb"] = round(
        sum(os.path.getsize(p) for p in glob.glob(corpus_dir + "/*.parquet")) / 1024**3, 2
    )

    # warm the Python worker pool so encode timing excludes interpreter spawn
    sampler.phase = "warm"
    tiny = spark.range(cpus * 4).selectExpr(
        "cast(id as string) doc_id", "array(1, 2, 2, 3) tokens", "4 n_tok", "'warm' source"
    )
    encode_df(tiny.repartition(cpus * 2), codec="auto").count()

    # -- phase 2: encode -> write encoded blocks (the ingest path, with sink)
    sampler.phase = "encode_write"
    t0 = time.time()
    shutil.rmtree(blocks_dir, ignore_errors=True)
    encode_df(spark.read.parquet(corpus_dir), codec="auto").write.parquet(blocks_dir)
    enc_s = time.time() - t0
    out["encode_write_s"] = round(enc_s, 1)

    import pyspark.sql.functions as F

    blocks = spark.read.parquet(blocks_dir)
    acct = blocks.agg(
        F.sum("n_values").alias("toks"),
        F.sum("raw_bytes").alias("raw"),
        F.sum("encoded_bytes").alias("enc"),
        F.sum(F.least("ref_rle_bytes", "raw_bytes")).alias("ref"),
        F.count("*").alias("blocks"),
    ).collect()[0]
    out["tokens"] = int(acct["toks"])
    out["encode_write_mtok_s"] = round(acct["toks"] / enc_s / 1e6, 1)
    out["compression_vs_raw"] = round(acct["raw"] / acct["enc"], 3)
    out["compression_vs_ref_formula"] = round(acct["ref"] / acct["enc"], 3)
    out["encoded_gb"] = round(
        sum(os.path.getsize(p) for p in glob.glob(blocks_dir + "/*.parquet")) / 1024**3, 2
    )

    # -- phase 3: decode-only x3 over the written blocks (every-epoch read)
    sampler.phase = "decode_only"
    reps = []
    for _ in range(3):
        t0 = time.time()
        row = (
            decode_stats_df(spark.read.parquet(blocks_dir))
            .agg(F.sum("tok_sum").alias("s"), F.sum("n_tok").alias("n"))
            .collect()[0]
        )
        reps.append(time.time() - t0)
        assert int(row["n"]) == int(acct["toks"]), "decode row-count drift"
    out["decode_reps_s"] = [round(r, 2) for r in reps]
    out["decode_best_mtok_s"] = round(acct["toks"] / min(reps) / 1e6, 1)
    out["decode_tok_sum"] = int(row["s"])

    sampler.phase = "done"
    sampler.stop_flag.set()
    sampler.join()
    out["peak_system_used_gb"] = round(sampler.peak_used, 1)
    out["peak_tree_rss_gb"] = round(sampler.peak_tree, 1)
    out["peak_shm_scratch_gb"] = round(sampler.peak_shm, 2)
    out["jvm_vmhwm_gb"] = round(_jvm_vmhwm_gb(), 1)
    out["phase_peak_used_gb"] = {k: round(v, 1) for k, v in sampler.phase_peaks.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
