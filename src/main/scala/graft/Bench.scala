package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Hermetic barrier between measured executions: drop every cached
    * query AND every persisted RDD (blocking, so the next query starts
    * with the block manager actually empty, not merely scheduled-empty).
    * Iterative operators pin one localCheckpoint per loop round and the
    * final round's blocks legitimately outlive the query (they back the
    * returned frame); without this sweep the 2×242 executions accumulate
    * pinned blocks until eviction churn dominates the tail of the run —
    * the BENCH_r06 failure mode (1708 s for a 323 s suite). */
  private def sweep(spark: SparkSession): Unit = {
    try {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] sweep failed: ${e.getMessage}")
    }
  }

  /** (steal, total) jiffies from /proc/stat's aggregate cpu line — the
    * hypervisor-contention counter. Young-GC pauses stretching from tens
    * of ms to seconds while the guest is otherwise idle is host CPU
    * steal; recording the per-query steal share makes a degraded bench
    * window provable from the artifact itself instead of adjudicated
    * after the fact (the BENCH_r06 1708-s failure mode). (-1, -1) when
    * unreadable (non-Linux). */
  private def cpuSteal(): (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (if (f.length > 7) f(7) else 0L, f.sum)
      } finally src.close()
    } catch { case _: Throwable => (-1L, -1L) }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_CONF="k=v;k=v": extra session confs for perf experiments
    // (e.g. spark.sql.codegen.wholeStage=false to isolate compile cost)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // profiling knobs (the driver sets neither): SPARK_GRAFT_ONLY=q36_ann_ivf
    // restricts the query set; SPARK_GRAFT_REPEAT=N re-runs each query N-1
    // times after its timed cold run (default 2 → one warm pass) — cold
    // minus warm isolates plan-setup cost (codegen compile + file listing)
    // from steady-state execution, and both columns land in
    // BENCH_DETAIL.json. The headline "value" is always the COLD total.
    // One-time session warm-up OUTSIDE the timed region: analyzer/optimizer
    // rule instantiation, shuffle + noop-sink machinery, codegen plumbing,
    // and the parquet read/write stack (footer reader, vectorized column
    // readers) via a throwaway /tmp file. Measured ~4.5 s on this host,
    // previously billed to whichever query ran first. Deliberately touches
    // NO test table — the test tables' file listing and footer reads stay
    // inside each query's timing.
    spark.range(16).repartition(2).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()
    // fixed path + overwrite: repeated bench runs reuse the scratch space
    val warmDir =
      s"${System.getProperty("java.io.tmpdir")}/graft-warm/w.parquet"
    spark.range(64).selectExpr("id", "cast(id as double) d", "cast(id as string) s")
      .write.mode("overwrite").parquet(warmDir)
    spark.read.parquet(warmDir).write.format("noop").mode("overwrite").save()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // default 2: every bench run measures one warm pass per query, so the
    // "fixed plan-setup amortizes at cluster scale" claim is MEASURED
    // fleet-wide in every BENCH_DETAIL (cold vs warm columns), not
    // per-anecdote; SPARK_GRAFT_REPEAT=1 turns the warm pass off
    val repeat = sys.env.get("SPARK_GRAFT_REPEAT").flatMap(_.toIntOption)
      .getOrElse(2)
    // sorted name order: deterministic run order (hash-map order made
    // whichever query landed first absorb blame for one-time session
    // warm-up, shuffling per-query numbers across code changes)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Per-query wall-clock cap: with 242 queries × 2 passes, one
    // pathological query (or one environment hiccup) must not eat the
    // driver's whole window and turn the artifact into noise. The query
    // runs on a dedicated thread under a job group; on deadline the job
    // group is cancelled, the query is recorded failed-slow (-2, excluded
    // from totals like any failure), and the run moves on.
    val deadlineS = sys.env.get("SPARK_GRAFT_DEADLINE_S")
      .flatMap(_.toIntOption).getOrElse(120)
    // noop sink: materializes every output column (count() would let
    // Catalyst prune the projections this bench is supposed to measure)
    // diagnosis knobs (driver sets neither): SPARK_GRAFT_SWEEP=0 turns the
    // hermetic sweep off; SPARK_GRAFT_INLINE=1 runs queries on the caller
    // thread with no deadline — for isolating harness overhead from plan
    // cost when a number looks off
    val doSweep = !sys.env.get("SPARK_GRAFT_SWEEP").contains("0")
    val inline = sys.env.get("SPARK_GRAFT_INLINE").contains("1")
    def execute(name: String, tag: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Boolean, Double, Double) = {
      val (steal0, jiffies0) = cpuSteal()
      def stealPct(): Double = {
        val (steal1, jiffies1) = cpuSteal()
        if (steal0 < 0 || steal1 < 0 || jiffies1 <= jiffies0) -1.0
        else 100.0 * (steal1 - steal0) / (jiffies1 - jiffies0)
      }
      if (inline) {
        val t0 = System.nanoTime()
        val out =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
                (true, (System.nanoTime() - t0) / 1e9, stealPct()) }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name $tag FAILED: ${e.getMessage}")
            (false, -1.0, stealPct())
          }
        if (doSweep) sweep(spark)
        return out
      }
      val group = s"bench-$name-$tag"
      val pool = java.util.concurrent.Executors.newSingleThreadExecutor(
        (r: Runnable) => { val t = new Thread(r, group); t.setDaemon(true); t })
      val t0 = System.nanoTime()
      val task = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          spark.sparkContext.setJobGroup(group, group,
            interruptOnCancel = true)
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          finally spark.sparkContext.clearJobGroup()
        }
      })
      val out =
        try { task.get(deadlineS, java.util.concurrent.TimeUnit.SECONDS)
              (true, (System.nanoTime() - t0) / 1e9, stealPct()) }
        catch {
          case _: java.util.concurrent.TimeoutException =>
            spark.sparkContext.cancelJobGroup(group)
            System.err.println(
              s"[bench] $name $tag FAILED-SLOW: exceeded ${deadlineS}s deadline")
            // give the cancelled job a moment to unwind so its tasks do
            // not overlap the next query's timing
            try task.get(15, java.util.concurrent.TimeUnit.SECONDS)
            catch { case _: Throwable => () }
            (false, -2.0, stealPct())
          case e: Throwable =>
            System.err.println(s"[bench] $name $tag FAILED: " +
              s"${Option(e.getCause).getOrElse(e).getMessage}")
            (false, -1.0, stealPct())
        }
      pool.shutdownNow()
      if (doSweep) sweep(spark) // hermetic: next execution starts clean
      out
    }
    val benchStart = System.nanoTime()
    val results = selected.map { case (name, fn) =>
      val (ok, cold, steal) = execute(name, "cold", fn)
      // run-relative clock + steal share per query: a spike in the
      // artifact is correlatable with GC logs / host contention directly
      System.err.println(f"[bench] $name cold: $cold%.2f s (at " +
        f"${(System.nanoTime() - benchStart) / 1e9}%.0f s into the run, " +
        f"host steal $steal%.1f%%)")
      // best (min) warm seconds across repeat-1 re-runs, -1 if none ran ok
      val warm = if (!ok) -1.0 else (2 to repeat).foldLeft(-1.0) { (best, r) =>
        val (warmOk, secs, _) = execute(name, s"warm$r", fn)
        // a failed warm run must not print a plausible-looking timing
        if (warmOk) System.err.println(
          f"[bench] $name warm run $r: $secs%.2f s (cold $cold%.2f)")
        if (!warmOk) best else if (best < 0) secs else math.min(best, secs)
      }
      // a failed query must not masquerade as a fast success
      name -> (if (ok) cold else cold.min(-1.0), warm, steal)
    }
    def fmt(v: Double) = f"$v%.3f"
    def jmap(vs: Seq[(String, Double)]) =
      vs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    val total = fmt(results.map(_._2._1).filter(_ >= 0).sum)
    val warmTotal = fmt(results.map(_._2._2).filter(_ >= 0).sum)
    val qsFull = jmap(results.map { case (k, (c, _, _)) => k -> c })
    val warmFull = jmap(results.map { case (k, (_, w, _)) => k -> w })
    val stealFull = jmap(results.map { case (k, (_, _, s)) => k -> s })
    // run-level steal share: jiffy-weighted mean across the cold passes
    val stealVals = results.map(_._2._3).filter(_ >= 0)
    val stealRun =
      if (stealVals.isEmpty) -1.0 else stealVals.sum / stealVals.size
    val full =
      s"""{"metric":"total","value":$total,"warm_value":$warmTotal,"unit":"sec","n_queries":${results.size},"steal_pct":${fmt(stealRun)},"queries":$qsFull,"warm":$warmFull,"steal":$stealFull,"sf":"$sfDir"}"""
    // The driver harvests only the LAST ~2000 chars of stdout and tries to
    // parse a JSON line out of it. With 150+ queries the full per-query map
    // is ~4.5 KB, so a single fat line gets truncated at the front and never
    // parses (BENCH_r01..r03 all show "parsed": null). So: the complete
    // detail goes to a file + stderr, and the FINAL stdout line is a compact
    // JSON — total plus the slowest queries, capped so line + sbt's trailing
    // "[success] ..." stay inside the tail window.
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json")
      try w.println(full) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] detail write failed: ${e.getMessage}")
    }
    System.err.println(full)
    val budget = 1500 // chars for the "queries" map in the stdout line
    val slowestFirst = results.sortBy(-_._2._1)
      .map { case (k, (c, _, _)) => s"\"" + k + "\":" + fmt(c) }
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    slowestFirst.foreach { s =>
      if (used + s.length + 1 <= budget) { kept += s; used += s.length + 1 }
    }
    val qsTop = kept.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"warm_value":$warmTotal,"unit":"sec","n_queries":${results.size},"steal_pct":${fmt(stealRun)},"queries":$qsTop,"sf":"$sfDir","detail":"BENCH_DETAIL.json"}""")
    spark.stop()
  }
}
