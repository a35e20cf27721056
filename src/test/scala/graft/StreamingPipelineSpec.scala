package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, Dedup}

/** The corpus-preparation operators on STREAMS. CorpusOps is pure row
  * functions (hash buckets, regex, explode) — no state, no watermark, no
  * rand() — so the exact same Column expressions run unchanged in a
  * streaming plan, and assignments agree bit-for-bit with the batch run:
  * the property that lets one codebase serve both the backfill and the
  * live ingest path. Decontamination joins the live stream against a
  * STATIC train-shingle set (stream-static join): the shape of continuous
  * ingest screening. */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit / shardIndex / chunkTokens run unchanged on a stream and match batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        CorpusOps.hashSplit(col("doc_id")).as("split"),
        CorpusOps.shardIndex(col("doc_id")).as("shard"))
    val q = stream.writeStream.format("memory").queryName("splits").start()
    try {
      in.addData((1L, "a"), (2L, "b"), (3L, "c"))
      q.processAllAvailable()
      val streamed = spark.table("splits")
        .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
      val batch = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
        .select(col("doc_id"),
          CorpusOps.hashSplit(col("doc_id")).as("split"),
          CorpusOps.shardIndex(col("doc_id")).as("shard"))
        .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
      assert(streamed === batch)
    } finally q.stop()

    val inChunk = MemoryStream[(Long, String)]
    val chunks = CorpusOps.chunkTokens(
      inChunk.toDF().toDF("doc_id", "text"), "doc_id", "text",
      window = 3, stride = 2)
    assert(chunks.isStreaming, "chunking stays a streaming plan")
    val qc = chunks.writeStream.format("memory").queryName("chunks").start()
    try {
      inChunk.addData((7L, "a b c d e"))
      qc.processAllAvailable()
      val got = spark.table("chunks").orderBy("chunk_idx")
        .select("chunk").as[String].collect().toSeq
      assert(got === Seq("a b c", "c d e", "e"))
    } finally qc.stop()
  }

  test("stateless text ops (rule mask, markup strip) run unchanged on a stream, match batch") {
    implicit val sqlCtx = spark.sqlContext
    val T = graft.functions.TextFunctions
    import graft.operators.TextPack
    def features(df: org.apache.spark.sql.DataFrame) = {
      val ts = T.tokenStats(col("text"))
      val n = ts.getField("ws_tokens")
      val mask =
        when(n >= 3 && n <= 1000, 0).otherwise(1) +
          when(T.vocabHitsText(col("text"), TextPack.stopwords) >= 1, 0).otherwise(2)
      df.select(col("doc_id"), mask.as("fail_mask"),
        T.stripMarkup(col("text")).as("clean"))
    }
    val rows = Seq(
      (1L, "the quick <b>brown</b> fox"),
      (2L, "the"),
      (3L, "no stop words whatsoever listed"))
    val in = MemoryStream[(Long, String)]
    val q = features(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("rules").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("rules")
        .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
      val batch = features(rows.toDF("doc_id", "text"))
        .as[(Long, Int, String)].collect().sortBy(_._1).toSeq
      assert(streamed === batch)
      assert(streamed.map(r => r._1 -> r._2).toMap === Map(1L -> 0, 2L -> 1, 3L -> 2))
      assert(streamed.head._3 === "the quick brown fox")
    } finally q.stop()
  }

  test("stream-static frequent-line screening: live docs drop lines from a static boilerplate set") {
    implicit val sqlCtx = spark.sqlContext
    // the batch pass (dropFrequentLines' frequency side) yields the
    // boilerplate line-hash set; live ingest then screens per-line against
    // it — the same static-probe shape as decontamination
    val boiler = Seq("subscribe now", "all rights reserved").toDF("line")
      .select(md5(col("line")).as("_lh")).distinct()
    val in = MemoryStream[(Long, Long, String)]
    val lines = in.toDF().toDF("doc_id", "idx", "line")
    val kept = lines.join(boiler, md5(col("line")) === col("_lh"), "left_anti")
    val q = kept.writeStream.format("memory").queryName("keptlines").start()
    try {
      in.addData((1L, 0L, "subscribe now"), (1L, 1L, "actual content here"),
        (2L, 0L, "all rights reserved"), (2L, 1L, "more content"))
      q.processAllAvailable()
      val got = spark.table("keptlines").select("doc_id", "line")
        .as[(Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(got === Seq((1L, "actual content here"), (2L, "more content")))
    } finally q.stop()
  }

  test("streaming curation end to end: rule filter -> exact dedup -> near-dup screen on one stream") {
    implicit val sqlCtx = spark.sqlContext
    val T = graft.functions.TextFunctions
    import graft.streaming.{StreamingDedup, StreamingNearDup}

    val base = "the quick brown fox jumps over the lazy dog again and again"
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = in.toDF().toDF("doc_id", "text", "ts")

    // stage 1 (stateless): minimum length + stopword presence
    val ruled = docs.filter(
      T.tokenStats(col("text")).getField("ws_tokens") >= 5 &&
        T.vocabHitsText(col("text"), graft.operators.TextPack.stopwords) >= 1)
    // stage 2 (stateful, watermark-bounded): exact content dedup
    val exact = StreamingDedup.exactDedupStream(ruled, "10 minutes")
    // stage 3 (stateful): MinHash LSH near-dup candidates over survivors
    val cands = StreamingNearDup.lshCandidates(
      exact.select(col("doc_id"), col("text")), shingleN = 3, numHashes = 16,
      bands = 4, idleTimeout = None)

    val qe = exact.writeStream.format("memory").queryName("cur_exact").start()
    val qc = cands.writeStream.format("memory").queryName("cur_cands").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      in.addData(
        (1L, base, t0),                       // survives everything
        (2L, "short", t0),                    // stage-1 reject: too short
        (3L, base, t0),                       // stage-2 reject: exact dup of 1
        (4L, base + " with a small tail", t0)) // near-dup of 1 -> stage-3 pair
      qe.processAllAvailable()
      qc.processAllAvailable()
      val survivors = spark.table("cur_exact").select("doc_id")
        .as[Long].collect().toSet
      assert(survivors === Set(1L, 4L),
        s"rule filter + exact dedup should leave 1 and 4, got $survivors")
      val pairs = spark.table("cur_cands").select("doc_a", "doc_b")
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 4L)), s"near-dup pair (1,4) not flagged in $pairs")
    } finally { qe.stop(); qc.stop() }
  }

  test("quality-logit scoring runs unchanged on a stream and matches batch") {
    implicit val sqlCtx = spark.sqlContext
    val sw = Seq("the", "a", "of")
    val rows = Seq((1L, "the cat of a hat sits on the mat again today"),
      (2L, "zxq wvu"), (3L, ""))
    val in = MemoryStream[(Long, String)]
    val scored = graft.operators.Selection.qualityLogit(col("text"), sw)
    val q = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"), round(scored, 6).as("s"))
      .writeStream.format("memory").queryName("qlogit").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("qlogit")
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
      val batch = rows.toDF("doc_id", "text")
        .select(col("doc_id"), round(scored, 6).as("s"))
        .as[(Long, Double)].collect().sortBy(_._1).toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-static cross-snapshot dedup: live ingest drops content already in the reference") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((1L, "seen before"), (2L, "also known")).toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val kept = graft.operators.Selection.crossDedup(
      in.toDF().toDF("doc_id", "text"), ref)
    assert(kept.isStreaming, "anti-join against the static reference stays streaming")
    val q = kept.writeStream.format("memory").queryName("xdedup").start()
    try {
      in.addData((10L, "SEEN  before"), (11L, "genuinely new"), (12L, "also known"))
      q.processAllAvailable()
      val got = spark.table("xdedup").select("doc_id").as[Long].collect().toSeq
      assert(got === Seq(11L),
        "normalized dups of the reference must not pass the live ingest screen")
    } finally q.stop()
  }

  test("stream-static decontamination: live eval docs screen against a static train set") {
    implicit val sqlCtx = spark.sqlContext
    val train = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val trainSh = Dedup.shingles(train, 5).select(col("sh")).distinct()

    val in = MemoryStream[(Long, String)]
    val evalSh = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.wordNgrams(
          graft.functions.TextFunctions.tokens(col("text")), 5)).as("sh"))
    // stream-static inner join: each micro-batch probes the static set
    val hits = evalSh.join(trainSh, "sh")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    val q = hits.writeStream.format("memory").queryName("contam")
      .outputMode("complete").start()
    try {
      in.addData(
        (100L, "the quick brown fox jumps over it"),
        (101L, "completely disjoint words only here now"))
      q.processAllAvailable()
      val got = spark.table("contam").as[(Long, Long)].collect().toMap
      assert(got(100L) >= 1L, "overlapping doc is flagged")
      assert(!got.contains(101L), "disjoint doc has no hits")
    } finally q.stop()
  }

  test("streaming quota admits per-domain caps across micro-batches and matches batch domainCap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val admitted = graft.streaming.StreamingQuota.enforce(
      in.toDF().toDF("doc_id", "domain"), cap = 2)
    val q = admitted.writeStream.format("memory").queryName("quota").start()
    try {
      in.addData((1L, "a"), (2L, "a"), (10L, "b"))
      q.processAllAvailable()
      // second batch: domain a is already full, b admits one more
      in.addData((3L, "a"), (11L, "b"), (12L, "b"))
      q.processAllAvailable()
      val got = spark.table("quota")
        .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
      assert(got === Seq((1L, "a", 1), (2L, "a", 2), (10L, "b", 1), (11L, "b", 2)),
        s"got $got")
      // arrival order == batch order here, so the admitted multiset equals
      // the batch twin's rank-limit cut
      val batch = graft.operators.Selection.domainCap(
        Seq((1L, "a"), (2L, "a"), (3L, "a"), (10L, "b"), (11L, "b"), (12L, "b"))
          .toDF("doc_id", "domain"),
        "domain", Seq(col("doc_id")), cap = 2)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(got.map(_._1) === batch)
    } finally q.stop()
  }

  test("stream-static novelty screen: live docs score marginal diversity against the reference corpus") {
    // the online face of the q205 arrival-order novelty: the reference
    // corpus's distinct gram set is the static side, each incoming doc's
    // grams join against it, novelty = fraction unmatched. Stateless per
    // batch (the static side carries all history), so the join is
    // streaming-legal as-is.
    implicit val sqlCtx = spark.sqlContext
    val T = graft.functions.TextFunctions
    val reference = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val refGrams = reference
      .select(explode(T.wordNgrams(T.tokens(col("text")), 3)).as("g"))
      .select(md5(col("g")).as("gh")).distinct()
    val in = MemoryStream[(Long, String)]
    val live = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(T.wordNgrams(T.tokens(col("text")), 3)).as("g"))
      .select(col("doc_id"), md5(col("g")).as("gh"))
      .join(refGrams.withColumn("seen", lit(true)), Seq("gh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
    val q = live.writeStream.format("memory").outputMode("complete")
      .queryName("novelty").start()
    try {
      in.addData(
        (10L, "the quick brown fox jumps high"), // 4 grams, 3 in the ref
        (11L, "entirely fresh phrasing nobody wrote before"),
        (12L, "pack my box with five dozen liquor jugs")) // verbatim ref
      q.processAllAvailable()
      val got = spark.table("novelty")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(got(10L) === (4L, 1L), "shared grams must count as seen")
      assert(got(11L)._1 === got(11L)._2, "fresh doc is 100% novel")
      assert(got(12L)._2 === 0L, "verbatim reference doc is 0% novel")
    } finally q.stop()
  }

  test("streaming bloom screen: static sketch probes a live stream scan-stage") {
    implicit val sqlCtx = spark.sqlContext
    graft.GraftExtensions.register(spark)
    // the reference sketch is STATIC (built once before the stream starts);
    // its serialized form rides the plan as a literal — the streaming shape
    // of q86, with zero per-batch joins
    val sketchBytes = (1 to 200).map(i => s"ref-$i").toDF("h")
      .agg(expr("graft_bloom_agg(h, 65536, 0.01d)"))
      .head().getAs[Array[Byte]](0)
    val in = MemoryStream[(Long, String)]
    val probed = in.toDF().toDF("doc_id", "item")
      .withColumn("sketch", lit(sketchBytes))
      .withColumn("hit", expr("graft_bloom_probe(sketch, item)"))
      .drop("sketch")
    val q = probed.writeStream.format("memory").queryName("bloomscreen").start()
    try {
      in.addData((1L, "ref-17"), (2L, "ref-200"), (3L, "not-in-ref-xyz"))
      q.processAllAvailable()
      val got = spark.table("bloomscreen")
        .as[(Long, String, Boolean)].collect().map(r => r._1 -> r._3).toMap
      assert(got(1L) && got(2L), "true members must hit on the stream")
      assert(!got(3L), "a non-member that misses proves the probe is live")
    } finally q.stop()
  }
}
