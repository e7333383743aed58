"""Throughput scaling evidence: same job, same input, N vs 4N cores.

Sandbox proxy for the north rule's "N vs 4N executors, scaling efficiency
>= 0.8" (no real cluster here — see BASELINE.md). The job is the flagship KG
pipeline (corpus -> triples -> node + edge tables) over a deterministic
scaled corpus; input is pre-written parquet with enough splits for any
parallelism level, so all runs read identical bytes.

Measurement protocol (the host is shared and noisy):
- every timed run executes in a FRESH subprocess/JVM (no heap carry-over);
- repeats are interleaved across core counts (2, 8, 32, 2, 8, 32, ...) so a
  host slowdown hits all levels equally; best-of is reported;
- primary N -> 4N pair is 2 -> 8 cores: the container's raw CPU scaling
  (plain multiprocessing sha256, no JVM) varies by the minute on this
  overcommitted host — measured 0.67-1.0 at 2->8 and 0.44-0.74 at 8->32,
  with hypervisor CPU steal rising from 0.2% (1 proc) to ~14% (32 procs,
  plus ~36% forced idle) under a saturating burn. Every timed child is
  therefore normalized against a same-minute sha256 ceiling probe, and
  /proc/stat steal around each child is recorded in the JSON.

Prints one JSON line and rewrites BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("DEEPKG_SCALING_ROWS", "3000000"))
REPEATS = int(os.environ.get("DEEPKG_SCALING_REPEATS", "3"))
# which local[N] levels to measure; adjacent pairs become scaling legs
# (the heavyweight curate chain skips the 2-core level — a 2-core child
# takes ~20 min/repeat and the 8 -> 32 pair is already the N -> 4N shape)
CORE_LEVELS = tuple(
    int(x) for x in os.environ.get("DEEPKG_SCALING_LEVELS", "2,8,32").split(",")
)
# "kg" = flagship extraction pipeline (corpus -> triples -> node/edge);
# "curate" = the composed training-data curation chain (quality+repetition
# gates -> LSH near-dup collapse via connected components -> eval-set
# decontamination -> stratified sampling -> sequence packing) — more shuffle
# variety (band joins, iterative CC, broadcast eval grams, grouped Arrow
# packing), i.e. the 100 TB job shape the engine claims beyond extraction
WORKLOAD = os.environ.get("DEEPKG_SCALING_WORKLOAD", "kg")


def _burn(n: int) -> None:
    import hashlib

    h = b"x"
    for _ in range(n):
        h = hashlib.sha256(h).digest()


def _host_probe(levels=CORE_LEVELS, per_proc=2_000_000) -> dict[int, float]:
    """Raw-host parallel throughput (hashes/sec) at each core level, via
    plain multiprocessing sha256 — no Spark/JVM. Captures the shared host's
    CURRENT CPU delivery so job scaling can be normalized against it."""
    import multiprocessing as mp
    import time as _t

    out = {}
    for c in levels:
        t0 = _t.time()
        with mp.Pool(c) as p:
            p.map(_burn, [per_proc] * c)
        out[c] = c * per_proc / (_t.time() - t0)
    return out

_CHILD_KG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from deepkg_spark.operators.graph import edge_table, node_table
from deepkg_spark.operators.relations import triples_frame
from deepkg_spark.session import get_spark

cores, input_dir = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name=f"scal{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores, active_processors=cores)
corpus = spark.read.parquet(input_dir)
corpus.limit(10).count()  # warm codegen before timing
t0 = time.monotonic()
edge_table(triples_frame(corpus)).write.format("noop").mode("overwrite").save()
node_table(triples_frame(corpus)).write.format("noop").mode("overwrite").save()
print("ELAPSED " + json.dumps(time.monotonic() - t0))
spark.stop()
"""

# the cli.py `curate` chain with permissive gates (the gates pass ~all of the
# synthetic md5-word docs — the point is the shuffle DAG, not the filter rate)
# and a noop sink; every stage count/materialize is inside the timed region,
# exactly like a production run's actions would be
_CHILD_CURATE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from deepkg_spark.operators.curation import (
    decontaminate, pack_sequences, repetition_stats, sample_stratified)
from deepkg_spark.operators.dedup import minhash_lsh_pairs
from deepkg_spark.operators.graph import connected_components
from deepkg_spark.operators.textstats import lang_id, quality_score
from deepkg_spark.session import get_spark

cores, input_dir = int(sys.argv[1]), sys.argv[2]
spark = get_spark(app_name=f"scal{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores, active_processors=cores)
all_docs = spark.read.parquet(input_dir)
all_docs.limit(10).count()  # warm codegen before timing
t0 = time.monotonic()
ev = all_docs.filter(F.col("doc_id") % 20 == 0)
docs = all_docs.filter(F.col("doc_id") % 20 != 0).persist()
gated = (
    docs.join(quality_score(docs).select("doc_id", "quality"), "doc_id")
    .join(repetition_stats(docs).select("doc_id", "dup_3gram_frac"), "doc_id")
    .filter((F.col("quality") >= 0.0) & (F.col("dup_3gram_frac") <= 0.9))
    .select("doc_id", "text").persist())
pairs = minhash_lsh_pairs(gated, tau=0.5).select(
    F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
comp = connected_components(gated.select(F.col("doc_id").alias("v")), pairs)
reps = comp.groupBy("component").agg(F.min("v").alias("doc_id"))
deduped = gated.join(reps.select("doc_id"), "doc_id", "left_semi").persist()
flags = decontaminate(deduped, ev, n=5)
clean = deduped.join(
    flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id", "left_semi")
lang = lang_id(clean).select("doc_id", "pred_lang")
sampled = sample_stratified(
    clean.join(lang, "doc_id"), {{"en": 900}}, default_permille=500,
    stratum_col="pred_lang").select("doc_id", "text")
packed = pack_sequences(sampled, budget=512, shard_size=1000)
packed.write.format("noop").mode("overwrite").save()
print("ELAPSED " + json.dumps(time.monotonic() - t0))
spark.stop()
"""


def _cpu_stat() -> tuple[int, int]:
    """(steal_jiffies, total_jiffies) from /proc/stat — hypervisor CPU
    steal is the direct overcommit signal on this shared box (measured
    rising 0.2% at 1 proc -> ~14% at 32 procs with ~36% forced idle
    during a saturating 32-proc sha256 burn)."""
    f = open("/proc/stat").readline().split()
    vals = [int(x) for x in f[1:9]]
    return vals[7], sum(vals)


def _run_once(cores: int, input_dir: str) -> float:
    child = _CHILD_KG if WORKLOAD == "kg" else _CHILD_CURATE
    out = subprocess.run(
        [sys.executable, "-c", child.format(repo=REPO), str(cores), input_dir],
        capture_output=True, text=True, timeout=2400,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ELAPSED "):
            return float(line.split()[1])
    raise RuntimeError(f"child failed at {cores} cores: {out.stderr[-2000:]}")


def main() -> None:
    # input parquet on tmpfs: the VM disk's bandwidth does not scale with
    # cores and would cap any parallel-read measurement
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="deepkg_scaling_", dir=base)
    try:
        # generate the input in a SUBPROCESS: py4j's JVM survives
        # spark.stop() until the owning python exits, and a lingering 48g
        # generation JVM was measured burning ~38% of a core through every
        # timed child run — a parasite on the very numbers being collected
        gen_fn = "scaled_corpus" if WORKLOAD == "kg" else "scaled_documents"
        gen = (
            "import sys; sys.path.insert(0, {repo!r});"
            "from deepkg_spark.session import get_spark;"
            "from deepkg_spark.sources.corpus import {fn};"
            "s = get_spark(app_name='deepkg-scaling-gen', master='local[32]');"
            "{fn}(s, {n}, partitions=64).write.mode('overwrite')"
            ".parquet({tmp!r}); s.stop()"
        ).format(repo=REPO, fn=gen_fn, n=N_ROWS, tmp=tmp)
        subprocess.run([sys.executable, "-c", gen], check=True, timeout=3600)
        # let the generation burst drain before the first probe/repeat —
        # otherwise the 1-min loadavg and the first host probe carry our own
        # generation load and look like a neighbor storm
        import time as _time

        _time.sleep(45)

        # probe the host ceiling IMMEDIATELY before each timed child (per
        # level, not per repeat): on this shared box the delivered CPU can
        # change minute-to-minute, so a per-repeat probe is already stale by
        # the third level. Record loadavg around each repeat so storm
        # windows are visible (and can be discarded) in the evidence table
        cooldown = int(os.environ.get("DEEPKG_SCALING_COOLDOWN", "0"))
        reps = []
        for _ in range(REPEATS):
            load0 = os.getloadavg()[0]
            host, job, steal = {}, {}, {}
            for c in CORE_LEVELS:
                # optional settle time so every level's probe+child starts
                # from the same thermal/turbo state — a 32-core burst
                # otherwise depresses the NEXT level's 2-proc probe ceiling
                if cooldown:
                    _time.sleep(cooldown)
                host[c] = _host_probe((c,))[c]
                st0 = _cpu_stat()
                job[c] = _run_once(c, tmp)
                st1 = _cpu_stat()
                steal[c] = round(
                    100.0 * (st1[0] - st0[0]) / max(st1[1] - st0[1], 1), 1
                )
            reps.append((host, job, (load0, os.getloadavg()[0]), steal))

        def eff(tput: dict[int, float], lo: int, hi: int) -> float:
            return tput[hi] / ((hi / lo) * tput[lo])

        legs = [
            (CORE_LEVELS[i], CORE_LEVELS[i + 1])
            for i in range(len(CORE_LEVELS) - 1)
        ]
        # per repeat: job throughput, host throughput, normalized efficiency
        per_rep = []
        for host, job, load, steal in reps:
            jt = {c: N_ROWS / job[c] for c in CORE_LEVELS}
            r = {
                "job_sec": {c: round(job[c], 2) for c in CORE_LEVELS},
                "loadavg": [round(load[0], 1), round(load[1], 1)],
                "steal_pct": steal,
            }
            for lo, hi in legs:
                r[f"job_eff_{lo}_{hi}"] = round(eff(jt, lo, hi), 3)
                r[f"host_eff_{lo}_{hi}"] = round(eff(host, lo, hi), 3)
                r[f"norm_eff_{lo}_{hi}"] = round(
                    eff(jt, lo, hi) / eff(host, lo, hi), 3
                )
            per_rep.append(r)
        # best raw and best normalized may come from different repeats (the
        # host probe itself is noisy); both are reported, with the full
        # per-repeat table as evidence
        summary = {}
        for lo, hi in legs:
            summary[f"raw_{lo}_{hi}"] = max(
                r[f"job_eff_{lo}_{hi}"] for r in per_rep
            )
            summary[f"norm_{lo}_{hi}"] = min(
                max(r[f"norm_eff_{lo}_{hi}"] for r in per_rep), 1.0
            )
        lo0, hi0 = legs[0]
        print(json.dumps({
            "metric": "scaling_efficiency_N_to_4N",
            "workload": WORKLOAD,
            "value": summary[f"raw_{lo0}_{hi0}"],
            "host_normalized": summary[f"norm_{lo0}_{hi0}"],
            "legs": summary,
            "unit": "ratio",
            "n_rows": N_ROWS,
            "repeats": per_rep,
            "target": 0.8,
        }))

        best = {c: min(rr[1][c] for rr in reps) for c in CORE_LEVELS}
        rows = "\n".join(
            f"| local[{c}] | {best[c]:.2f} | {N_ROWS / best[c]:,.0f} |"
            for c in CORE_LEVELS
        )
        leg_mds = []
        for lo, hi in legs:
            rep_rows = "\n".join(
                f"| {i + 1} | {r[f'job_eff_{lo}_{hi}']} | "
                f"{r[f'host_eff_{lo}_{hi}']} | {r[f'norm_eff_{lo}_{hi}']} | "
                f"{r['loadavg'][0]} -> {r['loadavg'][1]} | "
                f"{r['steal_pct'][lo]} / {r['steal_pct'][hi]} |"
                for i, r in enumerate(per_rep)
            )
            leg_mds.append(
                f"""Per-repeat N={lo} -> 4N={hi} efficiency, against the host ceiling
measured in the same minute (host_eff = what a perfectly scaling job could
achieve on the CPU the box actually delivered; loadavg before -> after each
repeat shown so storm-poisoned repeats are identifiable):

| repeat | job eff {lo}->{hi} | host ceiling {lo}->{hi} | job / ceiling | loadavg | steal% {lo}c/{hi}c |
|---|---|---|---|---|---|
{rep_rows}

**Best {lo}->{hi}: raw = {summary[f'raw_{lo}_{hi}']}, host-normalized = \
{summary[f'norm_{lo}_{hi}']}** (target >= 0.8). The host-normalized number is
the job-intrinsic scaling: raw job efficiency divided by the simultaneously
measured efficiency of an embarrassingly parallel baseline on the same cores
(the box exposes 32 logical CPUs but delivers ~23 cores of throughput, so a
raw 8->32 number is bounded by ~0.73 even for a perfect job).
"""
            )
        job_desc = (
            "Flagship KG pipeline (corpus -> triples -> node + edge tables)"
            if WORKLOAD == "kg"
            else "Composed curate chain (quality/repetition gates -> LSH "
            "near-dup collapse via connected components -> eval-set 5-gram "
            "decontamination -> stratified sampling -> sequence packing)"
        )
        legs_md = "\n".join(leg_mds)
        section = f"""## Measured scaling: {WORKLOAD} workload (sandbox proxy for N -> 4N executors)

{job_desc},
{N_ROWS:,} input rows, identical pre-split tmpfs parquet input, shuffle on
tmpfs. Each timed run is a fresh subprocess/JVM (warmed before timing);
repeats interleaved with a raw-host CPU probe (plain multiprocessing sha256)
because this sandbox shares CPUs with other tenants (loadavg ~10 observed)
and its delivered parallelism varies minute to minute.

Best wall times per core level over {REPEATS} repeats:

| cores | wall sec | rows/sec |
|---|---|---|
{rows}

{legs_md}"""
        # regenerate ONLY the marker-delimited scaling section so manually
        # written BENCH.md sections (protocol notes, per-round deltas) survive
        tag = "scaling" if WORKLOAD == "kg" else f"scaling-{WORKLOAD}"
        start, end = f"<!-- {tag}:start -->", f"<!-- {tag}:end -->"
        block = f"{start}\n{section}\n{end}"
        path = os.path.join(REPO, "BENCH.md")
        header = ("# BENCH — measured numbers for this engine\n\n"
                  "Headline per-query timings land in BENCH_r{N}.json via bench.py.\n")
        if os.path.exists(path):
            txt = open(path).read()
            if start in txt and end in txt:
                pre, rest = txt.split(start, 1)
                _, post = rest.split(end, 1)
                txt = pre + block + post
            else:
                txt = txt.rstrip() + "\n\n" + block + "\n"
        else:
            txt = header + "\n" + block + "\n"
        with open(path, "w") as f:
            f.write(txt)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
