package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.CorpusOps

/** Unit behavior of the corpus-preparation operators (CorpusOps +
  * DeflateRatio); the cross-engine exactness of the same ops is covered by
  * the PipelinePack oracles. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: exhaustive, disjoint, near-target fractions, layout-stable") {
    val n = 20000
    val ids = spark.range(n).toDF("id")
    val split = ids.select(col("id"), CorpusOps.hashSplit(col("id")).as("s"))
    val counts = split.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === n)
    assert(math.abs(counts("train") / n.toDouble - 0.8) < 0.02)
    assert(math.abs(counts("val") / n.toDouble - 0.1) < 0.01)
    assert(math.abs(counts("test") / n.toDouble - 0.1) < 0.01)
    // layout independence: repartitioning must not change any assignment
    val a = split.orderBy("id").as[(Long, String)].collect().toSeq
    val b = ids.repartition(13).select(col("id"), CorpusOps.hashSplit(col("id")).as("s"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(a === b)
  }

  test("stratifiedSample keeps per-stratum fractions and is a deterministic subset") {
    val df = spark.range(10000)
      .select(col("id"), (when(col("id") % 10 < 6, "big").otherwise("small")).as("g"))
    val kept = CorpusOps.stratifiedSample(df, "id", "g",
      Map("big" -> 0.25), defaultFrac = 1.0)
    val frac = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(frac("small") === 4000, "defaultFrac 1.0 keeps every row")
    assert(math.abs(frac("big") / 6000.0 - 0.25) < 0.03)
    assert(kept.count() === CorpusOps.stratifiedSample(df, "id", "g",
      Map("big" -> 0.25), defaultFrac = 1.0).count())
  }

  test("normalizeUrl canonical forms and idempotence") {
    val cases = Seq(
      ("HTTPS://WWW.Site.COM:443/A/b?utm_source=x&id=1#frag",
        "https://site.com/A/b?id=1"),
      ("http://Example.org:80/path/", "http://example.org/path"),
      ("https://example.org/p?utm_a=1&utm_b=2", "https://example.org/p"),
      ("https://example.org/p?id=2&utm_last=9", "https://example.org/p?id=2"),
      ("https://example.org/CaseKept/Path?Q=UPPER", "https://example.org/CaseKept/Path?Q=UPPER"),
      // 'utm_' in a path segment or inside another param's VALUE survives
      ("https://example.org/utm_guide/page?id=1", "https://example.org/utm_guide/page?id=1"),
      ("https://example.org/p?ref=utm_x&utm_y=2", "https://example.org/p?ref=utm_x"),
      ("https://example.org/p?utm_a=1&id=2&utm_b=3", "https://example.org/p?id=2"))
    val out = cases.toDF("url", "want")
      .select(CorpusOps.normalizeUrl(col("url")).as("got"), col("want"))
      .as[(String, String)].collect()
    out.foreach { case (got, want) => assert(got === want) }
    // idempotent: normalizing a canonical form is the identity
    val twice = cases.toDF("url", "want")
      .select(CorpusOps.normalizeUrl(CorpusOps.normalizeUrl(col("url"))).as("got2"),
        CorpusOps.normalizeUrl(col("url")).as("got1"))
      .as[(String, String)].collect()
    twice.foreach { case (g2, g1) => assert(g2 === g1) }
  }

  test("stripMarkup: tags out, entities decoded once, case preserved") {
    val cases = Seq(
      ("<p>Hello <b>World</b></p>", "Hello World"),
      ("a &amp; b &lt;c&gt;", "a & b <c>"),
      // double-escaped entity stays text: &amp;lt; is the literal "&lt;"
      ("x &amp;lt; y", "x &lt; y"),
      ("<div class=\"big\">it&#39;s &quot;fine&quot;</div>", "it's \"fine\""),
      ("no markup at all", "no markup at all"))
    val out = cases.toDF("html", "want")
      .select(graft.functions.TextFunctions.stripMarkup(col("html")).as("got"),
        col("want"))
      .as[(String, String)].collect()
    out.foreach { case (got, want) => assert(got === want) }
  }

  test("chunkTokens windows, overlap, and tail") {
    val df = Seq((1L, "a b c d e")).toDF("id", "text")
    val chunks = CorpusOps.chunkTokens(df, "id", "text", window = 3, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "n_toks", "chunk")
      .as[(Int, Int, String)].collect().toSeq
    assert(chunks === Seq((0, 3, "a b c"), (1, 3, "c d e"), (2, 1, "e")))
  }

  test("shardIndex: 16 balanced shards, stable under repartitioning") {
    val ids = spark.range(16000).toDF("id")
    val shards = ids.select(col("id"), CorpusOps.shardIndex(col("id")).as("s"))
    val counts = shards.groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(counts.keySet === (0 until 16).toSet)
    counts.values.foreach(n => assert(math.abs(n - 1000) < 150, s"skewed shard: $n"))
    val a = shards.orderBy("id").as[(Long, Int)].collect().toSeq
    val b = ids.repartition(7).select(col("id"), CorpusOps.shardIndex(col("id")).as("s"))
      .orderBy("id").as[(Long, Int)].collect().toSeq
    assert(a === b)
  }

  test("shardedWrite: 16 shard directories, round-trip preserves rows, assignment stable") {
    val path = java.nio.file.Files.createTempDirectory("shards").toFile.getAbsolutePath
    val df = spark.range(2000).toDF("id").withColumn("v", col("id") * 2)
    CorpusOps.shardedWrite(df, "id", path)
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.length === 16, dirs.mkString(","))
    val back = spark.read.parquet(path)
    assert(back.count() === 2000)
    // shard column survives as the partition column and matches recompute
    val mismatched = back
      .withColumn("expect", CorpusOps.shardIndex(col("id")))
      .filter(col("shard") =!= col("expect")).count()
    assert(mismatched === 0)
    // the byte-diffable-export invariant: rows inside every data file are
    // ascending by the shard key
    new java.io.File(path).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("shard=")).foreach { d =>
        d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
          val ids = spark.read.parquet(f.getAbsolutePath)
            .select("id").as[Long].collect().toSeq
          assert(ids === ids.sorted, s"unsorted rows in ${f.getName}")
        }
      }
  }

  test("dropFrequentLines: boilerplate over the doc-frequency bar removed, idx order kept") {
    val lines = Seq(
      (1L, 0L, "nav"), (1L, 5L, "beta"), (1L, 1L, "alpha"),
      (2L, 0L, "nav"), (2L, 1L, "gamma"),
      (3L, 0L, "nav"), (3L, 7L, "zz"), (3L, 3L, "aa")
    ).toDF("id", "idx", "line")
    val out = CorpusOps.dropFrequentLines(lines, "id", "idx", "line", maxDocFreq = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 1L, "alpha\nbeta"),
      (2L, 1L, 1L, "gamma"),
      (3L, 2L, 1L, "aa\nzz")))
  }

  test("dropFrequentLines: all-boilerplate doc reconstructs to empty; within-doc repeats count once") {
    val lines = Seq(
      (1L, 0L, "nav"), (1L, 1L, "dup"), (1L, 2L, "dup"),
      (2L, 0L, "nav"),
      (3L, 0L, "nav")
    ).toDF("id", "idx", "line")
    val out = CorpusOps.dropFrequentLines(lines, "id", "idx", "line", maxDocFreq = 3)
      .orderBy("id").as[(Long, Long, Long, String)].collect().toSeq
    // "dup" repeats within doc 1 but appears in ONE document: freq 1 < 3,
    // kept twice; "nav" hits 3 docs and is dropped everywhere, so docs 2-3
    // reconstruct to ""
    assert(out === Seq(
      (1L, 2L, 1L, "dup\ndup"),
      (2L, 0L, 1L, ""),
      (3L, 0L, 1L, "")))
  }

  test("cmsProbe: estimates never undercount, stay inside the eps*N band, merge-order stable") {
    val words = (1 to 400).flatMap(i => Seq.fill(i % 7 + 1)(s"w$i"))
    val df = words.toDF("tok")
    val n = words.length
    val sketch = df.agg(expr("count_min_sketch(tok, 0.01d, 0.99d, 42)").as("cms"))
    val exact = df.groupBy("tok").count()
    val checked = exact.crossJoin(sketch)
      .select(col("tok"), col("count"),
        TextFunctions.cmsProbe(col("cms"), col("tok")).as("est"))
      .as[(String, Long, Long)].collect()
    checked.foreach { case (tok, cnt, est) =>
      assert(est >= cnt, s"$tok undercounted: $est < $cnt")
      assert(est <= cnt + math.ceil(0.01 * n).toLong, s"$tok over band: $est vs $cnt")
    }
    // partitioning must not change the (seeded) estimates: counter adds commute
    val sketch2 = df.repartition(11).agg(
      expr("count_min_sketch(tok, 0.01d, 0.99d, 42)").as("cms"))
    val est1 = checked.map(r => r._1 -> r._3).toMap
    val est2 = exact.crossJoin(sketch2)
      .select(col("tok"), TextFunctions.cmsProbe(col("cms"), col("tok")))
      .as[(String, Long)].collect().toMap
    assert(est1 === est2)
  }

  test("mixtureWeights: integer weights replicate exactly, fractional parts sample") {
    val df = spark.range(4000)
      .select(col("id"), (when(col("id") % 4 === 0, "dbl")
        .when(col("id") % 4 === 1, "half")
        .otherwise("one")).as("d"))
    val out = CorpusOps.mixtureWeights(df, "id", "d",
      Map("dbl" -> 2.0, "half" -> 0.5), defaultWeight = 1.0)
    val n = out.groupBy("d").count().as[(String, Long)].collect().toMap
    assert(n("dbl") === 2000, "weight 2.0 = exactly two copies of 1000 rows")
    assert(n("one") === 2000, "weight 1.0 = identity")
    assert(math.abs(n("half") - 500) < 60, s"weight 0.5 ~ half of 1000: ${n("half")}")
    // copy indices are distinct per row (a shuffle can separate them)
    val reps = out.filter(col("d") === "dbl").groupBy("id")
      .agg(countDistinct(col("rep")).as("k")).agg(min("k"), max("k"))
      .as[(Long, Long)].head()
    assert(reps === ((2L, 2L)))
  }

  test("mixtureWeights: NULL domain folds into the '' stratum, sampled not dropped") {
    val df = spark.range(2000).select(col("id"),
      when(col("id") % 2 === 0, lit(null).cast("string")).otherwise("keep").as("d"))
    // fractional default weight: before the coalesce fix, every NULL-domain
    // row hashed to NULL and was silently dropped instead of sampled at 50%
    val out = CorpusOps.mixtureWeights(df, "id", "d",
      Map("keep" -> 1.0), defaultWeight = 0.5)
    val n = out.groupBy(coalesce(col("d"), lit("NULL"))).count()
      .as[(String, Long)].collect().toMap
    assert(n("keep") === 1000L)
    assert(math.abs(n("NULL") - 500) < 70,
      s"NULL-domain rows must sample at ~50%, got ${n.getOrElse("NULL", 0L)}")
    // and NULL strata match an explicit "" weight entry
    val out2 = CorpusOps.mixtureWeights(df, "id", "d",
      Map("" -> 2.0), defaultWeight = 1.0)
    assert(out2.filter(col("d").isNull).count() === 2000L,
      "NULL domain takes the '' stratum's weight (2 copies of 1000 rows)")
  }

  test("DeflateRatio: repetitive text compresses below varied text; deterministic; empty = 1.0") {
    val varied = (1 to 200).map(i => s"w${i * 7919 % 997}x$i").mkString(" ")
    val repetitive = Seq.fill(200)("spam ham").mkString(" ")
    val rows = Seq(("v", varied), ("r", repetitive), ("e", ""))
      .toDF("k", "t")
      .select(col("k"), TextFunctions.zratio(col("t")).as("z"))
      .as[(String, Double)].collect().toMap
    assert(rows("r") < rows("v"),
      s"repetitive ${rows("r")} should compress below varied ${rows("v")}")
    assert(rows("v") > 0.0 && rows("v") < 1.3)
    assert(rows("e") === 1.0)
    // determinism across evaluations
    val again = Seq(("v", varied)).toDF("k", "t")
      .select(TextFunctions.zratio(col("t"))).as[Double].head()
    assert(again === rows("v"))
    // SQL registration surface
    GraftExtensions.register(spark)
    val viaSql = Seq(varied).toDF("t").createOrReplaceTempView("zr_t")
    assert(spark.sql("SELECT graft_zratio(t) FROM zr_t").as[Double].head() === rows("v"))
  }

  test("HLL sketch rollup: union of group sketches estimates the global set") {
    // two groups with 50% overlap: union estimate must track the true
    // 150-element union (small-N DataSketches HLL is near-exact), and
    // the stored-sketch rollup must equal sketching the whole set
    val df = ((1 to 100).map(i => ("a", s"x$i")) ++
      (51 to 150).map(i => ("b", s"x$i"))).toDF("g", "v")
    val per = df.groupBy("g").agg(expr("hll_sketch_agg(v, 12)").as("sk"))
    val viaRollup = per
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("e"))
      .as[Double].head()
    val direct = df
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(v, 12))").as("e"))
      .as[Double].head()
    assert(viaRollup === direct) // rollup of stored sketches loses nothing
    assert(math.abs(viaRollup - 150.0) / 150.0 < 0.05)
  }

  test("rolling sketch window (q158 shape): union of stored per-day " +
    "sketches equals sketching the window's raw rows") {
    import spark.implicits._
    // 10 days, overlapping user sets; day d has users d*10 .. d*10+49
    val ev = (0 until 10).flatMap(d =>
      (d * 10 until d * 10 + 50).map(u => (d, u.toLong))).toDF("d", "user_id")
    val perDay = ev.groupBy("d").agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
    // trailing-3 window of day 5 = days 3..5, via the stored sketches
    val viaStored = perDay.filter(col("d").between(3, 5))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("e"))
      .as[Double].head()
    val direct = ev.filter(col("d").between(3, 5))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e"))
      .as[Double].head()
    assert(viaStored === direct)
    // exact distinct of days 3..5 = users 30..99 = 70; lgK=12 sketch is
    // in exact (sparse) mode at this cardinality
    assert(math.abs(viaStored - 70.0) / 70.0 < 0.05)
  }
}
