package graft

import java.nio.file.Files

import graft.streaming.{PredictBench, ServingStore}

/** The reference's random-workload latency clients re-expressed over the
  * ServingStore; deterministic seeds, CSV output (S12). */
class PredictBenchSpec extends SparkSpec {

  private def loadedStore(nUsers: Int, nItems: Int): ServingStore.FactorStore = {
    val store = ServingStore.factorStore()
    (1 to nUsers).foreach(u => store.put(s"$u-U", Array(0.1 * u, 0.2)))
    (1 to nItems).foreach(i => store.put(s"$i-I", Array(0.3, 0.1 * i)))
    store
  }

  test("ALS random bench: all keys present -> all found, stats complete") {
    val stats = PredictBench.alsRandom(loadedStore(50, 80), n = 200,
      numUsers = 50, numItems = 80)
    assert(stats.size === 200)
    assert(stats.forall(_.found))
    assert(stats.forall(s => !s.prediction.isNaN))
    assert(PredictBench.summary(stats).contains("\"queries\":200"))
  }

  test("ALS random bench records misses for absent keys") {
    val stats = PredictBench.alsRandom(loadedStore(10, 10), n = 100,
      numUsers = 100, numItems = 100)
    assert(stats.exists(!_.found))
  }

  test("SVM sparse bench: lookup count within the density envelope") {
    val store = ServingStore.factorStore()
    (1 to 500).foreach(f => store.put(s"$f-W", Array(0.01 * f)))
    val stats = PredictBench.svmRandom(store, n = 50, maxFeatures = 40,
      numFeatures = 500)
    assert(stats.forall(s => s.lookups >= 4 && s.lookups <= 40))
  }

  test("bucketed SVM bench agrees with flat lookups on the same workload") {
    val range = 100
    val flat = ServingStore.factorStore()
    val bucketed = ServingStore.factorStore()
    val weights = (1 to 500).map(f => f.toLong -> 0.01 * f).toMap
    weights.foreach { case (f, w) => flat.put(s"$f-W", Array(w)) }
    weights.groupBy { case (f, _) => f / range }.foreach { case (b, fs) =>
      val packed = new Array[Double](range)
      fs.foreach { case (f, w) => packed((f % range).toInt) = w }
      bucketed.put(s"$b-B", packed)
    }
    val fromFlat = PredictBench.svmRandom(flat, n = 30, maxFeatures = 20,
      numFeatures = 500, seed = 7L)
    val fromBuckets = PredictBench.svmBucketed(bucketed, n = 30,
      maxFeatures = 20, numFeatures = 500, range = range, seed = 7L)
    fromFlat.zip(fromBuckets).foreach { case (a, b) =>
      assert(math.abs(a.prediction - b.prediction) < 1e-9)
      assert(b.lookups <= a.lookups, "bucketing must not increase lookups")
    }
  }

  test("bucketed store built from the q05 range layout matches direct weights") {
    import org.apache.spark.sql.functions._
    val layout = graft.operators.SvmPack.queries("q05_range_partition")(spark, sf0)
    val store = graft.operators.SvmPack.bucketedStore(layout)
    val weights = graft.operators.SvmPack.weights(spark, sf0)
      .select(col("feature_id").cast("long"), col("w")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    weights.take(100).foreach { case (fid, w) =>
      val packed = store.get(s"${fid / graft.operators.SvmPack.Range}-B").get
      // layout payload is %.6f-formatted, so compare at that precision
      assert(math.abs(packed((fid % graft.operators.SvmPack.Range).toInt) - w) < 5e-7,
        s"feature $fid")
    }
  }

  test("S12: latency CSV has one row per query plus header") {
    val f = Files.createTempFile("bench", ".csv").toFile
    f.deleteOnExit()
    val stats = PredictBench.alsRandom(loadedStore(20, 20), n = 25,
      numUsers = 20, numItems = 20)
    PredictBench.writeCsv(f.getAbsolutePath, stats)
    val lines = Files.readAllLines(f.toPath)
    assert(lines.size === 26)
    assert(lines.get(0).startsWith("query_id,"))
  }
}
