#!/usr/bin/env python3
"""Multi-process scaling protocol (north rule: efficiency ≥0.8 from N to 4N
EXECUTORS — not threads).

bench_scaling.py measures local[N] vs local[4N]: both parallelism levels
share ONE JVM heap/GC, which round 2 identified as the residual limiter
(warm 4→16 single-JVM efficiency 0.63-0.79 with raw-CPU ceilings ~1.0).
A real cluster gives every executor its OWN JVM. This harness measures that
shape, two ways, so "it would scale on separate executors" is a measurement
rather than an argument:

A. **local-cluster protocol** (headline): the SAME full-corpus build job on
   `local-cluster[K,4,mem]` — K real executor JVMs × 4 cores each, separate
   heaps, real netty shuffles between processes — at K=1 vs K=4. This is
   Spark's own N-executor-cluster-in-a-box (used by Spark's test suite) and
   exercises the exact plan shipped at 100 TB: doc-grain repartition →
   tf/doc_len agg → shard repartition → mapInArrow encode → parquet write,
   with the shard shuffle crossing process boundaries.
B. **disjoint-slice protocol** (decomposition): K independent local[4]
   JVM children, pinned to DISJOINT 4-cpu sets, each building a disjoint
   1/K hash-slice of the corpus (the build is embarrassingly parallel
   across doc shards by design — SCALE.md §1). Aggregate throughput =
   total_docs / max(child wall). Isolates pure per-JVM scaling with zero
   shared heap and zero cross-process shuffle.

Both use the round-2 protocol hygiene: taskset-pinned process trees (the
K=1 config may not borrow idle cores), JIT warmup before the timed build,
identical n_shards=32 layout at both sizes, interleaved trials
(1,4,1,4,…) against hypervisor drift, best-of-trials per config, and an
in-session raw-CPU ceiling probe.

Usage:   python bench_multijvm.py [n_docs]          (default 1_000_000)
         HSE_MJ_PROTOCOLS=cluster,slice HSE_MJ_TRIALS=2 to override
Children: --child-cluster K CORES_PER_EXEC PAGES OUT
          --child-slice   SLICE K CORES PAGES OUT
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CORES_PER_EXEC = 4
EXEC_MEM_MB = 12288  # per-worker budget; executor JVM gets 10g of it
K_PAIR = (1, 4)      # N executors vs 4N executors


def _warmup_and_docs(spark, pages_path: str, total_cores: int):
    """Shared child preamble: read, repartition BEFORE the extraction UDF,
    cache, JIT-warm the tokenize/agg codegen on a 2% sample (steady-state
    protocol — see bench_scaling.py)."""
    from pyspark.sql import functions as F

    from hybrid_search_engine_spark.sources.pages import pages_to_docs

    spark.range(10_000_000).selectExpr("sum(id)").collect()
    pages = spark.read.parquet(pages_path)
    docs = pages_to_docs(pages, partitions=4 * total_cores).cache()
    n_docs = docs.count()
    (docs.sample(fraction=0.02, seed=1)
     .select(F.explode(F.regexp_extract_all(
         F.lower(F.col("text")), F.lit(r"[a-z0-9_]+"), 0)).alias("term"))
     .groupBy("term").count().groupBy().sum("count").collect())
    return docs, n_docs


def _repin_cluster_tree(k: int, cores_per_exec: int) -> None:
    """Real clusters run the driver OFF the executor nodes. Re-pin after
    executor registration: executor JVMs (CoarseGrainedExecutorBackend,
    plus their future python workers via inheritance) to cores
    0..4K-1, and the driver JVM + this python process to two cores above
    the executor span — so driver scheduling/RPC never steals executor
    CPU, identically at both K. Requires the parent to have granted the
    child a 4K+2-wide affinity mask."""
    import subprocess as sp
    exec_span = f"0-{k * cores_per_exec - 1}"
    drv_span = f"{k * cores_per_exec}-{k * cores_per_exec + 1}"
    try:
        pids = sp.check_output(
            ["pgrep", "-f", "CoarseGrainedExecutorBackend"]).split()
    except sp.CalledProcessError:
        return
    for pid in pids:
        os.system(f"taskset -a -cp {exec_span} {int(pid)} >/dev/null 2>&1")
    # this python process and its py4j driver JVM child
    os.system(f"taskset -a -cp {drv_span} {os.getpid()} >/dev/null 2>&1")
    try:
        jvm_pids = sp.check_output(["pgrep", "-P", str(os.getpid())]).split()
        for pid in jvm_pids:
            os.system(f"taskset -a -cp {drv_span} {int(pid)} >/dev/null 2>&1")
    except sp.CalledProcessError:
        pass


def _tally_eventlog(log_dir: str, t0_ms: float = 0.0,
                    t1_ms: float = float("inf")) -> dict:
    """Steal-resistant metrics from the Spark event log: aggregate task
    CPU/run/GC time and shuffle traffic. Wall-clock on this VM swings with
    hypervisor steal; executorCpuTime does not — equal CPU-seconds/doc at
    K=1 and K=4 proves the engine adds no serial work and localizes any
    wall gap in waiting (steal, fetch, scheduling)."""
    agg = {"cpu_s": 0.0, "run_s": 0.0, "gc_s": 0.0,
           "shuffle_write_mb": 0.0, "shuffle_read_mb": 0.0,
           "fetch_wait_s": 0.0, "write_time_s": 0.0, "tasks": 0}
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        paths += [os.path.join(root, fn) for fn in files
                  if not fn.startswith(".") and not fn.endswith(".crc")]
    for path in paths:
        with open(path, errors="replace") as f:
            for line in f:
                if '"Event":"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                info = ev.get("Task Info") or {}
                if not (t0_ms <= info.get("Finish Time", 0) <= t1_ms):
                    continue  # only the timed build window
                tm = ev.get("Task Metrics") or {}
                agg["tasks"] += 1
                agg["cpu_s"] += tm.get("Executor CPU Time", 0) / 1e9
                agg["run_s"] += tm.get("Executor Run Time", 0) / 1e3
                agg["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
                sw = tm.get("Shuffle Write Metrics") or {}
                agg["shuffle_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                agg["write_time_s"] += sw.get("Shuffle Write Time", 0) / 1e9
                sr = tm.get("Shuffle Read Metrics") or {}
                agg["shuffle_read_mb"] += (sr.get("Remote Bytes Read", 0)
                                           + sr.get("Local Bytes Read", 0)) / 1e6
                agg["fetch_wait_s"] += sr.get("Fetch Wait Time", 0) / 1e3
    return {k2: round(v, 2) for k2, v in agg.items()}


def child_cluster(k: int, cores_per_exec: int, pages_path: str, out_json: str) -> None:
    """One full-corpus build on a K-executor-JVM local cluster."""
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    from hybrid_search_engine_spark.build.manifest import build_index
    from hybrid_search_engine_spark.session import get_spark

    total = k * cores_per_exec
    extra = {
        "spark.executor.memory": "10g",
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "8g"),
    }
    eventlog_dir = None
    if os.environ.get("HSE_MJ_EVENTLOG") == "1":
        eventlog_dir = tempfile.mkdtemp(prefix=f"mjev{k}_")
        extra["spark.eventLog.enabled"] = "true"
        extra["spark.eventLog.dir"] = eventlog_dir
        # single uncompressed JSON file (Spark 4 defaults to rolling+zstd)
        extra["spark.eventLog.compress"] = "false"
        extra["spark.eventLog.rolling.enabled"] = "false"
    # experiment knob, e.g. HSE_MJ_EXTRA_CONF="spark.io.compression.codec=zstd"
    for kv in filter(None, os.environ.get("HSE_MJ_EXTRA_CONF", "").split(",")):
        key, _, val = kv.partition("=")
        extra[key.strip()] = val.strip()
    # HSE_MJ_SCRATCH=/dev/shm puts shuffle files AND the built index on
    # tmpfs for BOTH K legs (same substrate, fair ratio): this VM's
    # recurring multi-minute disk-write bursts land preferentially on the
    # long K=4/4M leg (round-3 record: 18-42× task write-time inflation on
    # byte-identical work), turning the scaling ratio into a measurement
    # of the co-tenant's burst schedule. A real cluster's executors write
    # to per-node disks with no co-tenant; tmpfs is the closest local
    # stand-in. RAM budget at K=4/4M: ~9 GB shuffle + ~4 GB index on a
    # 125 GB host.
    scratch = os.environ.get("HSE_MJ_SCRATCH")
    if scratch:
        local_dir = tempfile.mkdtemp(prefix=f"mjlocal{k}_", dir=scratch)
        extra["spark.local.dir"] = local_dir
        # local-cluster = standalone-in-a-box: the in-process Worker
        # OVERRIDES spark.local.dir with SPARK_LOCAL_DIRS (SparkConf warns
        # so), so executor shuffle files only land on the scratch via the
        # env var — set both.
        os.environ["SPARK_LOCAL_DIRS"] = local_dir
    spark = get_spark(
        app=f"mjcluster{k}x{cores_per_exec}",
        cores=total,  # sizes shuffle width identically to local[total]
        master=f"local-cluster[{k},{cores_per_exec},{EXEC_MEM_MB}]",
        extra_conf=extra,
    )
    if os.environ.get("HSE_MJ_DRIVER_ISOLATE") == "1":
        spark.range(1000).count()  # force executor registration first
        _repin_cluster_tree(k, cores_per_exec)
    docs, n_docs = _warmup_and_docs(spark, pages_path, total)
    idx_dir = os.path.join(
        tempfile.mkdtemp(prefix=f"mjc{k}_", dir=scratch or None), "idx")
    t0 = time.time()
    build_index(spark, docs, idx_dir, n_shards=32)
    build_s = time.time() - t0
    t1 = time.time()
    execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    rec = {"k": k, "n_docs": n_docs, "build_s": round(build_s, 3),
           "docs_per_sec": round(n_docs / build_s, 1),
           "jvm_endpoints": execs}
    if os.environ.get("HSE_MJ_QUERIES") == "1":
        # query path on real executors: per-query latency (40 queries,
        # pruned path, warm executor-side postings cache) + one-plan batch
        from fixtures.gen_corpus import all_queries

        from hybrid_search_engine_spark.build.manifest import IndexReader

        queries = all_queries()
        reader = IndexReader(spark, idx_dir, cache_postings=True,
                             cache_tf=True)

        def run_tier(mode: str) -> list:
            lat = []
            for q in queries[:40]:
                tq = time.time()
                reader.search(q, k=10, mode=mode).collect()
                lat.append(time.time() - tq)
            lat.sort()
            return lat

        def pct(lat, p):
            return round(lat[min(len(lat) - 1, int(p * len(lat)))] * 1000, 1)

        # serving tier first (JVM-only single stage), then the pruned
        # scale tier — both warm, identical query set, rank-identical.
        # SYMMETRIC warmup (round-4 advice): each tier gets one full
        # discarded pass before its measured pass, so neither pays
        # one-time JIT / Python-worker-spawn / Arrow-codegen cost inside
        # its measured tail percentiles.
        run_tier("exact")  # discarded warm pass (JVM JIT + tf cache touch)
        lat_exact = run_tier("exact")
        run_tier("pruned")  # discarded warm pass (py-worker spawn + Arrow)
        lat = run_tier("pruned")

        tb = time.time()
        n_rows = reader.search_batch(list(enumerate(queries)), k=10).count()
        rec["query"] = {"p50_ms": pct(lat, 0.50), "p95_ms": pct(lat, 0.95),
                        "p99_ms": pct(lat, 0.99), "n": len(lat),
                        "batch_qps": round(len(queries) / (time.time() - tb), 1),
                        "batch_rows": n_rows,
                        # protocol provenance (round-4 advice): since the
                        # round-4 serving-tier work, this tier is measured
                        # with cache_tf resident in executor memory and
                        # 120 exact-tier queries run first — numbers under
                        # this key are NOT comparable to pre-round-4 runs
                        # of the same key, which had no tf cache.
                        "protocol": "r5: warm pass discarded; cache_tf "
                                    "resident; measured after exact tier"}
        rec["query_serving_tier"] = {
            "p50_ms": pct(lat_exact, 0.50), "p95_ms": pct(lat_exact, 0.95),
            "p99_ms": pct(lat_exact, 0.99), "n": len(lat_exact)}
    spark.stop()
    if eventlog_dir:
        time.sleep(2)  # let the event log flush
        m = _tally_eventlog(eventlog_dir, t0 * 1000, t1 * 1000)
        m["cpu_us_per_doc"] = round(1e6 * m["cpu_s"] / max(n_docs, 1), 1)
        rec["task_metrics"] = m
    with open(out_json, "w") as f:
        json.dump(rec, f)
    # a 1M/4M index+tf is 1-4 GB; dozens of trials filled the disk once —
    # children clean their own scratch
    import shutil
    shutil.rmtree(os.path.dirname(idx_dir), ignore_errors=True)
    if scratch and "spark.local.dir" in extra:
        shutil.rmtree(extra["spark.local.dir"], ignore_errors=True)
        os.environ.pop("SPARK_LOCAL_DIRS", None)
    if eventlog_dir:
        if os.environ.get("HSE_MJ_KEEP_EVENTLOG") == "1":
            print(f"[child] event log kept: {eventlog_dir}", file=sys.stderr)
        else:
            shutil.rmtree(eventlog_dir, ignore_errors=True)


def child_slice(slice_idx: int, k: int, cores: int, pages_path: str, out_json: str) -> None:
    """Build ONE disjoint 1/K hash-slice of the corpus in an isolated
    local[cores] JVM (executor-process simulation with zero sharing)."""
    from pyspark.sql import functions as F

    from hybrid_search_engine_spark.build.manifest import build_index
    from hybrid_search_engine_spark.session import get_spark

    spark = get_spark(app=f"mjslice{slice_idx}of{k}", cores=cores,
                      extra_conf={"spark.driver.memory": "10g"})
    from hybrid_search_engine_spark.sources.pages import pages_to_docs

    spark.range(10_000_000).selectExpr("sum(id)").collect()
    pages = spark.read.parquet(pages_path)
    if k > 1:
        pages = pages.where(F.pmod(F.xxhash64("url"), F.lit(k)) == slice_idx)
    docs = pages_to_docs(pages, partitions=4 * cores).cache()
    n_docs = docs.count()
    (docs.sample(fraction=0.02, seed=1)
     .select(F.explode(F.regexp_extract_all(
         F.lower(F.col("text")), F.lit(r"[a-z0-9_]+"), 0)).alias("term"))
     .groupBy("term").count().groupBy().sum("count").collect())
    idx_dir = os.path.join(tempfile.mkdtemp(prefix=f"mjs{slice_idx}_"), "idx")
    t0 = time.time()
    build_index(spark, docs, idx_dir, n_shards=32)
    build_s = time.time() - t0
    spark.stop()
    with open(out_json, "w") as f:
        json.dump({"slice": slice_idx, "k": k, "n_docs": n_docs,
                   "build_s": round(build_s, 3),
                   "docs_per_sec": round(n_docs / build_s, 1)}, f)
    import shutil
    shutil.rmtree(os.path.dirname(idx_dir), ignore_errors=True)


def _membw_ceiling(lo: int, hi: int, secs: float = 6.0) -> dict:
    """Aggregate memory bandwidth at `lo` vs `hi` pinned processes (numpy
    triad b = 2a + c over 64 MiB arrays, counted as 3×8 bytes/element).
    The scaling stages stream text through regex/Arrow — if the host's
    memory controller saturates between 4 and 16 cores, that ratio (not
    1.0) is the ceiling any engine can reach on THIS box; on a real 4-node
    cluster each node brings its own controller."""
    import multiprocessing as mp

    def burn(q):
        import numpy as np
        n = 8 * 1024 * 1024  # 64 MiB per array
        a = np.ones(n)
        c = np.ones(n)
        b = np.empty(n)
        np.multiply(a, 2.0, out=b)  # touch all pages before timing
        t_end = time.time() + secs
        iters = 0
        while time.time() < t_end:
            # in-place triad: no allocation, no page faults in the loop
            np.multiply(a, 2.0, out=b)
            np.add(b, c, out=b)
            iters += 1
        q.put(iters * 4 * 8 * n)  # bytes: read a, write b, read b+c, write b

    out = {}
    for procs in (lo, hi):
        q = mp.Queue()
        ps = [mp.Process(target=burn, args=(q,)) for _ in range(procs)]
        for i, p in enumerate(ps):
            p.start()
            os.system(f"taskset -cp {i} {p.pid} >/dev/null 2>&1")
        total = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        out[procs] = total / secs / 1e9
    out["gbps"] = {str(k): round(v, 1) for k, v in out.items() if isinstance(k, int)}
    out["membw_ceiling_eff"] = round(out[hi] / out[lo] / (hi / lo), 3)
    return out


def _run_cluster_trial(k: int, pages_path: str, out: str) -> dict:
    total = k * CORES_PER_EXEC
    # driver isolation grants 2 cores ABOVE the executor span (the child
    # re-pins executors vs driver inside the mask) — a real cluster's
    # driver runs off the executor nodes at both K, so both configs get
    # the same topology
    span = total + 1 if os.environ.get("HSE_MJ_DRIVER_ISOLATE") == "1" else total - 1
    subprocess.run(
        ["taskset", "-c", f"0-{span}", sys.executable,
         os.path.abspath(__file__), "--child-cluster", str(k),
         str(CORES_PER_EXEC), pages_path, out],
        check=True, cwd=REPO)
    with open(out) as f:
        return json.load(f)


def _run_slice_trial(k: int, pages_path: str, outdir: str, trial: int) -> dict:
    """K simultaneous children on disjoint cpu sets; aggregate throughput
    counts total docs over the SLOWEST child's build wall (cluster
    semantics: the job finishes when the last executor does)."""
    procs = []
    outs = []
    for j in range(k):
        out = os.path.join(outdir, f"slice{k}_{j}_{trial}.json")
        outs.append(out)
        lo, hi = j * CORES_PER_EXEC, (j + 1) * CORES_PER_EXEC - 1
        procs.append(subprocess.Popen(
            ["taskset", "-c", f"{lo}-{hi}", sys.executable,
             os.path.abspath(__file__), "--child-slice", str(j), str(k),
             str(CORES_PER_EXEC), pages_path, out],
            cwd=REPO))
    rc = [p.wait() for p in procs]
    if any(rc):
        raise RuntimeError(f"slice children failed: {rc}")
    rs = []
    for out in outs:
        with open(out) as f:
            rs.append(json.load(f))
    n_docs = sum(r["n_docs"] for r in rs)
    wall = max(r["build_s"] for r in rs)
    return {"k": k, "n_docs": n_docs, "build_s": wall,
            "docs_per_sec": round(n_docs / wall, 1),
            "per_child_docs_per_sec": [r["docs_per_sec"] for r in rs],
            "per_child_n_docs": [r["n_docs"] for r in rs]}


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child-cluster":
        child_cluster(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--child-slice":
        child_slice(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                    sys.argv[5], sys.argv[6])
        return

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    protocols = os.environ.get("HSE_MJ_PROTOCOLS", "cluster,slice").split(",")
    n_trials = int(os.environ.get("HSE_MJ_TRIALS", "2"))

    from fixtures.gen_corpus import write_pages_parquet

    cache_dir = os.path.join(REPO, ".fixtures")
    os.makedirs(cache_dir, exist_ok=True)
    pages_path = os.path.join(cache_dir, f"pages_{n_docs}.parquet")
    if not os.path.exists(pages_path):
        print(f"generating {n_docs}-doc corpus …", file=sys.stderr)
        write_pages_parquet(pages_path, n_docs)

    workdir = tempfile.mkdtemp(prefix="bench_multijvm_")
    report: dict = {"n_docs": n_docs, "cores_per_exec": CORES_PER_EXEC,
                    "k_pair": list(K_PAIR), "trials": n_trials}

    # weak-scaling (Gustafson) corpus for the hi-K config: a 4× cluster is
    # sized to process a 4× corpus in the same wall-clock — per-executor
    # work matched, per-stage fixed costs amortized identically. "strong"
    # protocols keep the SAME corpus at both K (per-stage fixed cost then
    # lands 4× harder on the short hi-K run — both numbers are reported).
    weak_pages_path = None
    if any(p.endswith("_weak") for p in protocols):
        n_hi = n_docs * (K_PAIR[1] // K_PAIR[0])
        weak_pages_path = os.path.join(cache_dir, f"pages_{n_hi}.parquet")
        if not os.path.exists(weak_pages_path):
            print(f"generating {n_hi}-doc weak-scaling corpus …", file=sys.stderr)
            write_pages_parquet(weak_pages_path, n_hi)

    for proto in protocols:
        base = proto.replace("_weak", "")
        weak = proto.endswith("_weak")
        best: dict[int, dict | None] = {k: None for k in K_PAIR}
        trials_log: dict[int, list] = {k: [] for k in K_PAIR}
        for trial in range(n_trials):
            for k in K_PAIR:  # interleaved 1,4,1,4 … (hypervisor drift)
                pages = weak_pages_path if (weak and k == K_PAIR[1]) \
                    else pages_path
                t_label = f"{proto} K={k} trial {trial}"
                print(f"[multijvm] {t_label} …", file=sys.stderr)
                if base == "cluster":
                    out = os.path.join(workdir, f"{proto}{k}_{trial}.json")
                    r = _run_cluster_trial(k, pages, out)
                else:
                    r = _run_slice_trial(k, pages, workdir, f"{proto}{trial}")
                print(f"[multijvm]   -> {r['docs_per_sec']} docs/s", file=sys.stderr)
                trials_log[k].append(r["docs_per_sec"])
                if best[k] is None or r["docs_per_sec"] > best[k]["docs_per_sec"]:
                    best[k] = r
                time.sleep(15)
        lo_k, hi_k = K_PAIR
        eff = (best[hi_k]["docs_per_sec"] / best[lo_k]["docs_per_sec"]) / (hi_k / lo_k)
        report[proto] = {
            f"k{lo_k}": best[lo_k], f"k{hi_k}": best[hi_k],
            "all_trials_docs_per_sec": trials_log,
            "scaling_efficiency": round(eff, 3),
        }
        print(f"[multijvm] {proto}: efficiency={eff:.3f}", file=sys.stderr)

    # hardware ceilings for the same core spans, measured in-session:
    # ALU (busy-loop) and memory bandwidth (numpy triad) — tokenize/agg
    # stages are bandwidth-hungry, and 16 cores of one host share a memory
    # controller a real 4-node cluster would not
    from bench_scaling import _cpu_ceiling
    lo_c, hi_c = CORES_PER_EXEC * K_PAIR[0], CORES_PER_EXEC * K_PAIR[1]
    ceiling = _cpu_ceiling(lo_c, hi_c)
    membw = _membw_ceiling(lo_c, hi_c)
    report["cpu_ceiling_eff"] = ceiling["cpu_ceiling_eff"]
    report["membw_ceiling_eff"] = membw["membw_ceiling_eff"]
    report["membw_gbps"] = membw["gbps"]
    hw_eff = min(ceiling["cpu_ceiling_eff"], membw["membw_ceiling_eff"])
    for proto in protocols:
        report[proto]["efficiency_vs_ceiling"] = round(
            report[proto]["scaling_efficiency"] / hw_eff, 3)

    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # never clobber the curated gate report: first run owns MULTIJVM.*,
    # later runs (reproducibility attempts) land in *_latest_run.* and are
    # integrated into the curated MD by hand with their validity analysis
    suffix = "" if not os.path.exists(
        os.path.join(REPO, "BENCH", "MULTIJVM.md")) else "_latest_run"
    with open(os.path.join(REPO, "BENCH", f"MULTIJVM{suffix}.json"),
              "w") as f:
        json.dump(report, f, indent=1)
    _write_md(report, protocols, suffix)


def _write_md(report: dict, protocols: list[str], suffix: str = "") -> None:
    lo_k, hi_k = report["k_pair"]
    c = report["cores_per_exec"]
    lines = [
        "# BENCH/MULTIJVM — N vs 4N *executor JVMs* (north-rule scaling gate)",
        "",
        f"Corpus: {report['n_docs']:,} deterministic synthetic web pages "
        f"(fixtures/gen_corpus.py). Identical build job (n_shards=32) at "
        f"K={lo_k} vs K={hi_k} executors × {c} cores each; separate JVM "
        "heaps at both sizes (this is the configuration round 2's "
        "single-JVM 0.63-0.79 number could not represent). Interleaved "
        f"best-of-{report['trials']} trials, taskset-pinned process trees, "
        "JIT-warmed children — protocol otherwise identical to "
        "BENCH/BASELINE.md.",
        "",
        "| protocol | docs/s @ K=1 (4 cores) | docs/s @ K=4 (16 cores) | efficiency | vs CPU ceiling |",
        "|---|---|---|---|---|",
    ]
    for proto in protocols:
        p = report[proto]
        verdict = "**PASS ≥0.8**" if p["scaling_efficiency"] >= 0.8 else "below 0.8"
        lines.append(
            f"| {proto} | {p[f'k{lo_k}']['docs_per_sec']:,} | "
            f"{p[f'k{hi_k}']['docs_per_sec']:,} | "
            f"**{p['scaling_efficiency']:.3f}** ({verdict}) | "
            f"{p['efficiency_vs_ceiling']:.3f} |")
    lines += [
        "",
        f"Hardware ceiling probes (same session, {lo_k * c}→{hi_k * c} "
        f"pinned processes): ALU busy-loop {report['cpu_ceiling_eff']:.3f} "
        f"of ideal; memory bandwidth {report['membw_ceiling_eff']:.3f} of "
        f"ideal (aggregate triad GB/s: {report['membw_gbps']}). "
        "'vs CPU ceiling' uses the binding (smaller) probe — a real "
        "4-node cluster brings 4 memory controllers; this host has one.",
        "",
        "- **cluster** = `local-cluster[K,4," + str(EXEC_MEM_MB) + "]`: one "
        "logical Spark job over the full corpus, K real executor JVMs, "
        "shard shuffle crossing process boundaries — Spark's own "
        "cluster-in-a-box, the same layout `spark-submit` ships to a real "
        "standalone/YARN cluster.",
        "- **slice** = K independent pinned local[4] JVMs over disjoint "
        "1/K hash-slices; aggregate throughput counts total docs over the "
        "slowest child (cluster completion semantics). Isolates per-JVM "
        "scaling with zero shared heap.",
        "- **…_weak** = weak-scaling (Gustafson) variant: the K=4 config "
        "processes a 4× corpus — matched per-executor work, per-stage "
        "fixed cost amortized identically at both sizes. This is how a "
        "real 4× cluster is used (throughput sizing); the plain variants "
        "are strong scaling (same corpus, 4× shorter run → stage fixed "
        "costs land 4× harder).",
        "",
        "Per-trial docs/s: " + json.dumps(
            {p: report[p]["all_trials_docs_per_sec"] for p in protocols}),
        "",
        "Raw: " + json.dumps(report),
    ]
    with open(os.path.join(REPO, "BENCH", f"MULTIJVM{suffix}.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote BENCH/MULTIJVM{suffix}.md", file=sys.stderr)


if __name__ == "__main__":
    main()
