package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VectorFunctions._
import graft.operators.Training

/** ScalaCheck-generator properties for the algebraic kernels (SURVEY.md
  * §5.3) — sampled with fixed seeds (no scalatestplus bridge in the
  * offline cache, so sampling is explicit and deterministic). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val vecGen: Gen[Array[Double]] =
    Gen.listOfN(8, Gen.choose(-10.0, 10.0)).map(_.toArray)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  test("dot is symmetric, linear, and matches a reference loop") {
    val cases = samples(Gen.zip(vecGen, vecGen, Gen.choose(-5.0, 5.0)), 20)
    val df = cases.toDF("a", "b", "s")
    val rows = df.select(
      dot($"a", $"b"), dot($"b", $"a"),
      dot(transform($"a", x => x * $"s"), $"b"),
      $"a", $"b", $"s")
      .as[(Double, Double, Double, Array[Double], Array[Double], Double)]
      .collect()
    rows.foreach { case (ab, ba, sab, a, b, s) =>
      val expected = a.zip(b).map { case (x, y) => x * y }.sum
      assert(math.abs(ab - expected) < 1e-9, "reference loop")
      assert(math.abs(ab - ba) < 1e-9, "symmetry")
      assert(math.abs(sab - s * ab) < 1e-6, "linearity")
    }
  }

  test("mean vector is permutation invariant") {
    val vs = samples(vecGen, 6).toList
    def mean(xs: List[Array[Double]]): Seq[Double] =
      Training.meanVector(xs.map(Tuple1(_)).toDF("factors"))
        .as[Array[Double]].collect()(0).toSeq.map(x => math.rint(x * 1e9))
    val shuffled = new scala.util.Random(7).shuffle(vs)
    assert(mean(vs) === mean(shuffled))
  }

  test("range bucketing: bucket * range <= idx < (bucket+1) * range") {
    samples(Gen.choose(1L, 100000L), 100).foreach { idx =>
      val bucket = idx / graft.operators.SvmPack.Range
      assert(bucket * graft.operators.SvmPack.Range <= idx)
      assert(idx < (bucket + 1) * graft.operators.SvmPack.Range)
    }
  }

  test("axpy then inverse axpy is identity") {
    val cases = samples(Gen.zip(vecGen, vecGen, Gen.choose(-5.0, 5.0)), 20)
    val df = cases.toDF("x", "y", "alpha")
    val rows = df.select(
      axpy(-$"alpha", $"x", axpy($"alpha", $"x", $"y")), $"y")
      .as[(Array[Double], Array[Double])].collect()
    rows.foreach { case (roundtrip, y) =>
      roundtrip.zip(y).foreach { case (r, yi) =>
        assert(math.abs(r - yi) < 1e-9)
      }
    }
  }

  test("chunkTokens covers every token, windows overlap by window-stride") {
    import graft.operators.CorpusOps
    val textGen = Gen.zip(Gen.choose(1, 40), Gen.choose(2, 6), Gen.choose(1, 5))
    samples(textGen, 15).foreach { case (nToks, window, stride) =>
      val toks = (0 until nToks).map(i => s"t$i")
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val chunks = CorpusOps.chunkTokens(df, "doc_id", "text", window, stride)
        .orderBy("chunk_idx").select("n_toks", "chunk")
        .as[(Int, String)].collect()
      // coverage: the multiset of tokens at stride boundaries reconstructs
      // the input — chunk i starts at token i*stride
      chunks.zipWithIndex.foreach { case ((n, chunk), i) =>
        val want = toks.slice(i * stride, i * stride + window)
        assert(chunk === want.mkString(" "),
          s"chunk $i of ($nToks, w=$window, s=$stride)")
        assert(n === want.length)
      }
      // full coverage holds exactly when windows at least touch
      // (stride <= window); stride > window is deliberate subsampling
      if (stride <= window) {
        val covered = chunks.flatMap(_._2.split(" ")).toSet
        assert(covered === toks.toSet)
      }
    }
  }

  test("hash split and mixture weights compose: every split keeps its mixture ratio") {
    import graft.operators.CorpusOps
    // split assignment and mixture sampling use independent salts, so the
    // joint distribution factorizes: applying both never starves a cell
    val df = spark.range(12000)
      .select(col("id"), (when(col("id") % 2 === 0, "a").otherwise("b")).as("d"))
    val out = CorpusOps.mixtureWeights(df, "id", "d", Map("a" -> 2.0), 1.0)
      .select(col("id"), col("d"), CorpusOps.hashSplit(col("id")).as("split"))
    val cells = out.groupBy("d", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (d, s, n) => (d, s) -> n }.toMap
    // domain a: 6000 rows ×2 → 12000; domain b: 6000 ×1
    for (s <- Seq("train", "val", "test")) {
      val frac = if (s == "train") 0.8 else 0.1
      assert(math.abs(cells(("a", s)) - 12000 * frac) < 12000 * frac * 0.15 + 30,
        s"cell (a, $s): ${cells(("a", s))}")
      assert(math.abs(cells(("b", s)) - 6000 * frac) < 6000 * frac * 0.15 + 30,
        s"cell (b, $s): ${cells(("b", s))}")
    }
  }

  test("blockedPrefixSum is a valid exclusive prefix chain under random ties and blocks") {
    val rowsGen = Gen.listOfN(60, Gen.zip(
      Gen.choose(0.0, 3.0).map(s => math.floor(s * 4) / 4), // heavy ties
      Gen.choose(1L, 9L)))
    samples(rowsGen, 5).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.zipWithIndex
        .map { case ((score, n), idx) => (idx.toLong, score, n) }
        .toDF("id", "score", "n")
      val blk = floor((lit(3.0) - col("score")) * 2).cast("long") // monotone in score desc
      val out = graft.operators.CorpusOps
        .blockedPrefixSum(df, blk, Seq(col("score").desc, col("id")), col("n"))
        .select("id", "n", "cum_before")
        .as[(Long, Long, Long)].collect().toSeq
      var running = 0L
      out.sortBy(_._3).foreach { case (id, n, cb) =>
        assert(cb === running, s"case $i: chain broken at id=$id")
        running += n
      }
      assert(running === rows.map(_._2).sum, s"case $i: total mismatch")
    }
  }

  test("SGD step with tiny lr reduces squared error on a single rating") {
    val cases = samples(Gen.zip(vecGen, vecGen, Gen.choose(0.5, 5.0)), 10)
    cases.foreach { case (u, v, r) =>
      val pred = u.zip(v).map { case (a, b) => a * b }.sum
      val err = r - pred
      val lr = 1e-3
      val u2 = u.zip(v).map { case (ui, vi) => ui + lr * err * vi }
      val pred2 = u2.zip(v).map { case (a, b) => a * b }.sum
      assert(math.abs(r - pred2) <= math.abs(err) + 1e-12,
        s"error should not grow: $err -> ${r - pred2}")
    }
  }

  test("dupRuns matches a brute-force replay on random shared-phrase corpora") {
    // random 4-doc corpora over a tiny vocab (forced window collisions),
    // W=3 windows; the operator must agree with a literal driver-side
    // replay of the first-seen/df/island semantics on every corpus
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd")
    val docGen = Gen.choose(3, 14).flatMap(n => Gen.listOfN(n, wordGen))
    val corpusGen = Gen.listOfN(4, docGen)
    samples(corpusGen, 8).zipWithIndex.foreach { case (docs, ci) =>
      val W = 3
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.operators.Dedup.dupRuns(df, W).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_runs"), r.getAs[Long]("n_shared_windows"),
            r.getAs[Long]("max_run"), r.getAs[Long]("max_span_toks"))).toMap
      // driver-side replay
      val wins = docs.zipWithIndex.flatMap { case (ws, i) =>
        ws.sliding(W).zipWithIndex.collect {
          case (w, p) if w.length == W => (i.toLong, p, w.mkString(" "))
        }
      }
      val docFreq = wins.groupBy(_._3)
        .view.mapValues(_.map(_._1).distinct.size).toMap
      val expected = wins.filter(w => docFreq(w._3) >= 2)
        .groupBy(_._1).map { case (id, shared) =>
          val pos = shared.map(_._2).sorted
          val runLens = {
            var out = List.empty[Int]; var cur = 0; var prev = Int.MinValue
            pos.foreach { p =>
              if (p == prev + 1) cur += 1 else { if (cur > 0) out ::= cur; cur = 1 }
              prev = p
            }
            if (cur > 0) out ::= cur
            out
          }
          id -> (runLens.length.toLong, pos.length.toLong,
            runLens.max.toLong, (runLens.max + W - 1).toLong)
        }
      assert(got === expected, s"corpus #$ci: $docs")
    }
  }

  test("preferencePairs equals a sort-based reference on random groups") {
    val rowGen = for {
      g <- Gen.oneOf("g1", "g2", "g3")
      id <- Gen.choose(1L, 40L)
      q <- Gen.oneOf(0.1, 0.2, 0.5, 0.5, 0.9) // repeated value forces ties
    } yield (g, id, q)
    samples(Gen.listOfN(12, rowGen), 8).foreach { rows =>
      val data = rows.distinctBy(r => (r._1, r._2)) // unique (group, id)
      val df = data.toDF("grp", "doc_id", "qual")
      val got = graft.operators.Selection
        .preferencePairs(df, Seq("grp"), "doc_id", "qual")
        .collect().map(r => r.getAs[String]("grp") ->
          (r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"))).toMap
      val expected = data.groupBy(_._1).flatMap { case (g, rs) =>
        val byQualDesc = rs.sortBy(r => (-r._3, r._2))
        val byQualAsc = rs.sortBy(r => (r._3, r._2))
        val (qMax, qMin) = (byQualDesc.head._3, byQualAsc.head._3)
        if (rs.size >= 2 && qMax > qMin)
          Some(g -> (byQualDesc.head._2, byQualAsc.head._2))
        else None
      }
      assert(got === expected)
    }
  }
}
