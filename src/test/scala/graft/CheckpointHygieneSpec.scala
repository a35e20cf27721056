package graft

/** Round-7 guardrail: iterative operators must not leak checkpoint blocks.
  *
  * `localCheckpoint` persists the physical RDD outside the CacheManager,
  * so un-released loop rounds pin blocks for the life of the session. On a
  * long-lived driver running queries back-to-back that leak inflated a
  * 242-query bench ~8× (VERDICT r6 tasks 1–2). The fix pairs every
  * iterative checkpoint with a release of the round it supersedes
  * ([[graft.plans.Checkpoints.roll]]); this spec proves it sticks: each
  * sampled loop-heavy contract query runs to completion, and the number of
  * persisted RDDs that survive the action must be the small constant its
  * RETURNED plan legitimately holds — never proportional to the loop's
  * round count (pre-fix: HITS pinned 4/iteration, Lloyd k-means
  * 2/round, connected components 1/round).
  */
class CheckpointHygieneSpec extends SparkSpec {

  // the production hermetic barrier itself — the spec exercises the exact
  // code path Bench/Verify run between executions (VERDICT r7 task 6)
  private def sweep(): Unit = graft.plans.Checkpoints.sweep(spark)

  // query -> max persisted RDDs allowed to survive its action: the final
  // frames the returned plan holds (loop results + shared lazy subframes
  // still referenced by the output), with +1 headroom. The falsifiable
  // property is that the bound is ROUND-COUNT-INDEPENDENT: re-running with
  // more iterations must not move it.
  private val bounds = Map(
    // bound = measured leftover + 1 headroom (measured 2026-08-14, info
    // lines below print the live count every run)
    "q57_dup_groups" -> 3, // 2: final cc labels + pair-pipeline pin
    "q159_bfs_reach" -> 2, // 1: final hop table only
    "q123_hits" -> 4, // 3: node table + final hub/auth tables
    "q121_personalized_pagerank" -> 4, // 3: invariants + last ranks cp
    "q241_kmeans_rounds" -> 3, // 2: final centroids + final assignment
    "q242_cluster_purity" -> 3, // 2: same shared (memoized) fit
    "q239_bradley_terry" -> 3, // 2: players + final strengths
    "q224_golden_record" -> 3, // 2: record frame + final cc labels
    "q235_fps_coreset" -> 8, // 6: corpus pin + per-step 1-row pins
    "q132_bpe_vocab" -> 2 // 0: BPE loop caches pair with unpersists
  )

  bounds.toSeq.sortBy(_._1).foreach { case (name, bound) =>
    test(s"$name leaves <= $bound persisted RDDs after its action") {
      sweep()
      try {
        SparkEntry.queries(name)(spark, sf0)
          .write.format("noop").mode("overwrite").save()
        val left = spark.sparkContext.getPersistentRDDs.size
        info(s"$name: $left persisted RDDs survive the action")
        assert(left <= bound,
          s"$name leaked $left persisted RDDs (bound $bound) — an " +
            "iterative checkpoint is missing its paired release")
      } finally sweep()
    }
  }
}
