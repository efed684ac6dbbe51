package graft.engine

import org.apache.spark.sql.SparkSession

/** Engine-wide SparkSession config defaults, applied by every entry point
  * (Bench/Verify/Smoke/tests/tools) so behavior doesn't depend on who
  * built the session.
  *
  * `spark.buffer.pageSize` is pinned because Spark derives the Tungsten
  * page size from `maxTungstenMemory / cores` clamped to [1 MB, 64 MB]
  * (`MemoryManager.pageSizeBytes`): on a large-heap driver/executor
  * (e.g. 90 GB at local[32]) every short sort/join task allocates and
  * zeroes 64 MB pages, which dominated the runtime of the LSH band
  * self-join (measured 3.2 s → 1.5 s at sf0.1 with an 8 MB page on a
  * 90 GB heap; identical timings on an 8 GB heap where the derived page
  * was already 8 MB). 8 MB keeps page-allocation cost proportional to
  * the work per task; large sorts just chain more pages, which is cheap.
  */
object SessionDefaults {
  def apply(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.buffer.pageSize",
      sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "8m"))
    // Shuffled-hash join only when the RUNTIME map output says the
    // partition fits: a statically forced SHJ builds an unspillable hash
    // relation over its whole shuffle partition, which grows with the
    // data — the dedup self-joins died with "Can't acquire memory to
    // build hash relation" on the 100× documents soak. With the static
    // hints on merge and this threshold, AQE converts SMJ→SHJ per stage
    // only when every partition ≤ 64 MB, keeping the small-scale hash
    // build win without the large-scale OOM.
    .config("spark.sql.adaptive.shuffleHashJoinLocalMapThreshold", "64m")
    // AQE partition COALESCING is off; the rest of AQE (skew-join split,
    // SMJ→SHJ local-map conversion, runtime replans) stays on. Two
    // measured reasons (r7 ppjoin variance investigation, PpjoinProbe):
    // 1. Coalescing is byte-based (advisory 64 MB / min 1 MB targets),
    //    which starves CPU-DENSE, byte-light stages of parallelism: the
    //    shingle-intersect self-join collapsed from 131 tasks to 45,
    //    concentrating seconds of per-row kernel CPU onto 3-4 threads.
    // 2. The coalesce specs vary run to run, so the post-coalesce stages
    //    compile fresh generated classes each execution; hot call sites
    //    go megamorphic and the JIT deoptimizes — identical data flipped
    //    between 2 s (compiled) and 30 s (interpreted, 12× task CPU)
    //    nondeterministically. With coalescing off: stable 2.0-2.5 s
    //    over 16 consecutive runs, no storms.
    // At cluster scale the engine's guidance is the same one Spark's own
    // docs give when shuffle.partitions is sized to the cluster (we pin
    // it to the core count): coalescing then only merges the partitions
    // you deliberately provisioned. Skew handling — the half of AQE this
    // workload actually needs at 100 TB — is unaffected.
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
  // NOTE (r7 100× re-soak): an earlier r7 session forced the serialized
  // sort shuffle writer engine-wide (bypassMergeThreshold=0) after
  // stack-sampling showed the bypass writer's file churn dominating
  // sf0.1 multi-exchange queries (q21 1.5 s → 0.74 s). Re-soaking the
  // relational headline at 100× (60M-row lineitem) showed the trade
  // INVERTS at scale: with large partitions the serialized path pays a
  // record sort per map task while bypass streams 32 sequential files —
  // measured same-session A/B at 100×: q5 56 s → 11 s, q3 14.5 s →
  // 4.8 s just from restoring the default threshold (sf0.1 cost: q21
  // 0.80 → 1.09 s, well inside the gate). The default (200) now stands:
  // bypass for few-reducer local runs, serialized automatically above
  // 200 reducers — which is also the cluster regime. The other lever at
  // scale is sizing shuffle.partitions to the DATA, not the core count:
  // 32 (the sf0.1 gate profile) at 100× under-provisions partitions
  // ~8×; the 100× soak runs 256 (SPARK_GRAFT_SHUFFLE_PARTITIONS), which
  // alone recovers q5 12.8 s → 3.7 s. AQE partition coalescing stays
  // off (the JIT-storm finding above is a small-scale pathology, and
  // with partitions sized correctly coalescing adds nothing at 100×:
  // 3.71 s vs 3.68 s best-of).
}
