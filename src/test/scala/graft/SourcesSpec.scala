package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.{ModelConsumer, ServingStore}

/** Source/sink surface (SURVEY.md §2.1): typed CSV with delimiter/header,
  * libsvm, text, recursive enumeration, the streaming file source feeding
  * the serve loop, and the overwrite text sink. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) = {
    val d = Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("S1: CSV ratings scan honors delimiter and header options") {
    val dir = tmpDir("csv")
    Files.writeString(java.nio.file.Paths.get(s"$dir/r.csv"),
      "user_id\titem_id\trating\n1\t2\t3.5\n4\t5\t1.0\n")
    val df = Tables.ratingsCsv(spark, s"$dir/r.csv", delimiter = "\t", header = true)
    assert(df.schema.fieldNames.toSeq === Seq("user_id", "item_id", "rating"))
    assert(df.count() === 2)
    assert(df.filter(col("user_id") === 1).select("rating")
      .first().getDouble(0) === 3.5)
  }

  test("S3: libsvm scan produces (label, features)") {
    val dir = tmpDir("libsvm")
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.txt"),
      "1.0 1:0.5 3:0.25\n-1.0 2:1.5\n")
    val df = Tables.libsvm(spark, s"$dir/d.txt")
    assert(df.schema.fieldNames.toSeq === Seq("label", "features"))
    assert(df.count() === 2)
  }

  test("Tables.invalidate refreshes a rewritten dir without evicting siblings") {
    val root = tmpDir("inval")
    val dir = s"$root/sf1"
    val sibling = s"$root/sf10"
    spark.range(3).toDF("id").write.parquet(s"$dir/documents.parquet")
    spark.range(7).toDF("id").write.parquet(s"$sibling/documents.parquet")
    assert(Tables.table(spark, dir, "documents").count() === 3)
    assert(Tables.table(spark, sibling, "documents").count() === 7)
    val cachedSibling = Tables.table(spark, sibling, "documents")
    spark.range(5).toDF("id").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    Tables.invalidate(spark, dir)
    assert(Tables.table(spark, dir, "documents").count() === 5)
    // segment-anchored prefix: sf1 must not evict sf10's cached relation
    assert(Tables.table(spark, sibling, "documents") eq cachedSibling)
  }

  test("robustCsv quarantines malformed rows instead of failing the scan") {
    val dir = tmpDir("badcsv")
    Files.writeString(java.nio.file.Paths.get(s"$dir/r.csv"),
      "1,2,3.5\nnot,a,number,extra\n4,5,1.0\ngarbage\n")
    // materialize the parse before splitting (Spark disallows raw-scan
    // queries that reference only the corrupt column; pruning would
    // re-parse with a partial schema) — the documented ingest pattern
    val df = Tables.robustCsv(spark, s"$dir/r.csv", Tables.ratingSchema)
      .cache()
    try {
      val good = df.filter(col("_bad").isNull)
      val bad = df.filter(col("_bad").isNotNull).select("_bad").as[String]
      assert(good.count() === 2)
      assert(good.select(sum("rating")).first().getDouble(0) === 4.5)
      // the quarantine column carries the raw line for the dead-letter sink
      assert(bad.collect().toSet === Set("not,a,number,extra", "garbage"))
    } finally df.unpersist()
  }

  test("S4/S5: recursive text scan enumerates nested dirs") {
    val dir = tmpDir("txt")
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/nested/deep"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/top.txt"), "a\nb\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/nested/deep/in.txt"), "c\n")
    assert(Tables.textLines(spark, dir, recursive = true).count() === 3)
  }

  test("S10: overwrite text sink round-trips records") {
    val dir = tmpDir("sink") + "/out"
    val recs = graft.operators.Ratings.userFactors(spark, sf0)
      .limit(10)
      .select(graft.operators.ModelCodec.encodeRecord(
        col("user_id"), lit("U"), col("uf")).as("value"))
    recs.write.mode("overwrite").text(dir)
    recs.write.mode("overwrite").text(dir) // overwrite semantics: no append
    assert(Tables.textLines(spark, dir).count() === 10)
  }

  test("JSON-lines scan: explicit schema, malformed rows quarantined not fatal") {
    val dir = tmpDir("json") + "/docs"
    val good = Tables.table(spark, sf0, "documents")
      .select("doc_id", "lang", "n_chars").limit(20)
    good.write.mode("overwrite").json(dir)
    // plant a malformed line next to the good part files
    val bad = new java.io.PrintWriter(s"$dir/zz_bad.json")
    try bad.println("""{"doc_id": 999, "lang": "en", "n_chars": NOT_JSON""")
    finally bad.close()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, lang STRING, n_chars BIGINT")
    // cache: Spark refuses filters touching ONLY the corrupt-record
    // column on a raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val back = Tables.jsonLines(spark, dir, schema).cache()
    assert(back.filter(col("_bad").isNull).count() === 20)
    assert(back.filter(col("_bad").isNotNull).count() === 1,
      "the malformed line must land in quarantine, not kill the scan")
    // values round-trip exactly
    val got = back.filter(col("_bad").isNull)
      .select("doc_id", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = good.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("ORC scan round-trips with column pruning and pushdown like parquet") {
    val dir = tmpDir("orc") + "/li"
    val src = Tables.table(spark, sf0, "lineitem")
      .select("l_orderkey", "l_quantity", "l_discount").limit(100)
    src.write.mode("overwrite").orc(dir)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "l_orderkey BIGINT, l_quantity DOUBLE, l_discount DOUBLE")
    val back = Tables.orc(spark, dir, schema)
    assert(back.count() === 100)
    val pruned = back.filter(col("l_quantity") > 25).select("l_orderkey")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"ORC scan must prune to the referenced columns:\n$scan")
    assert(scan.contains(
      "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)]"),
      s"the exact filter set must reach the ORC scan:\n$scan")
  }

  test("streaming exact dedup keeps the first arrival of each content") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val deduped = graft.streaming.StreamingDedup.exactDedupStream(
      in.toDF().toDF("doc_id", "text", "ts"))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      def ts(m: Int) = new java.sql.Timestamp(86400000L + m * 60000L)
      in.addData((1L, "hello world", ts(0)), (2L, "other text", ts(1)))
      q.processAllAvailable()
      // later copies (same content, different whitespace/case) are dropped
      in.addData((3L, "Hello   WORLD", ts(2)), (4L, "fresh content", ts(3)))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L, 4L), s"got $ids")
    } finally q.stop()
  }

  test("columnar/semi-structured sinks round-trip: ORC and JSON-lines") {
    val src = Tables.table(spark, sf1, "documents")
      .select("doc_id", "source", "n_chars").orderBy("doc_id").limit(50)
    val want = src.as[(Long, String, Long)].collect().toSeq

    val orcDir = tmpDir("orc") + "/docs.orc"
    src.write.mode("overwrite").orc(orcDir)
    val orc = spark.read.orc(orcDir).orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(orc === want)

    // JSON-lines: schema supplied on read (schema inference is a full
    // pre-scan of the input — never acceptable at corpus scale)
    val jsonDir = tmpDir("json") + "/docs.json"
    src.write.mode("overwrite").json(jsonDir)
    val json = spark.read.schema(src.schema).json(jsonDir).orderBy("doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(json === want)
  }

  test("S6: streaming file source feeds the serve loop (SGD.java dir poll)") {
    val dir = tmpDir("stream")
    val store = ServingStore.factorStore()
    val q = ModelConsumer.serveTo(spark, Tables.textStream(spark, dir), store)
    try {
      Files.writeString(java.nio.file.Paths.get(s"$dir/m1.txt"),
        "1,U,0.100000;0.200000\n2,I,0.300000;0.400000\n")
      q.processAllAvailable()
      assert(store.get("1-U").get.toSeq === Seq(0.1, 0.2))
      // a later file overwrites — PROCESS_CONTINUOUSLY semantics
      Files.writeString(java.nio.file.Paths.get(s"$dir/m2.txt"),
        "1,U,0.900000;0.800000\n")
      q.processAllAvailable()
      assert(store.get("1-U").get.toSeq === Seq(0.9, 0.8))
      assert(store.size === 2)
    } finally q.stop()
  }
}
