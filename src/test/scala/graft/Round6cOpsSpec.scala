package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Independent plain-Scala re-derivations of the q238–q242 contract
  * queries on sf0.001 (the Round6OpsSpec discipline: a THIRD code path
  * besides the Spark plan and its DuckDB twin, so a shared formula bug
  * still gets caught). */
class Round6cOpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def sim4(a: Array[Double], b: Array[Double]): Double = {
    val den = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    BigDecimal(dot(a, b) / den)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def snap6(x: Double): Double = math.floor(x * 1e6) / 1e6

  /** Spark/DuckDB round(x): HALF AWAY FROM ZERO — math.round rounds
    * half toward +inf, which disagrees on negative .5 ties (embedding
    * components are negative; caught live by the q241 replay). */
  private def roundAway(x: Double): Long =
    if (x >= 0) math.round(x) else -math.round(-x)

  private def loadEmb(): Map[Long, Array[Double]] =
    Tables.table(spark, sf0, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap

  test("q238: MMR selection equals a full local greedy replay") {
    import graft.operators.RerankPack.{MmrCand, MmrK, MmrLambda}
    val emb = loadEmb()
    val qids = emb.keys.filter(_ % 50 == 0).toSeq.sorted
    val expected = qids.flatMap { q =>
      val cand = emb.keys.filter(_ != q).toSeq
        .map(id => (id, sim4(emb(id), emb(q))))
        .sortBy { case (id, s) => (-s, id) }.take(MmrCand)
      val first = cand.head
      var sel = Vector((q, 1, first._1, snap6(MmrLambda * first._2)))
      var selected = Set(first._1)
      (2 to MmrK).foreach { t =>
        val scored = cand.filterNot(c => selected(c._1)).map { case (id, rel) =>
          val pen = selected.map(s => sim4(emb(id), emb(s))).max
          (id, snap6(MmrLambda * rel - (1 - MmrLambda) * pen))
        }
        val (wid, wmmr) = scored.minBy { case (id, m) => (-m, id) }
        sel :+= ((q, t, wid, wmmr))
        selected += wid
      }
      sel
    }.sortBy(r => (r._1, r._2))
    val got = run("q238_mmr_rerank")
      .as[(Long, Int, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(got == expected)
    // diversity property: within each query the selected set's internal
    // max pairwise similarity never exceeds the top-K prefix's (MMR is
    // at least as diverse as plain top-k on every query, strictly more
    // diverse on at least one)
    val diffs = qids.map { q =>
      val topk = emb.keys.filter(_ != q).toSeq
        .map(id => (id, sim4(emb(id), emb(q))))
        .sortBy { case (id, s) => (-s, id) }.take(MmrK).map(_._1)
      val mmr = expected.filter(_._1 == q).map(_._3)
      def maxPair(ids: Seq[Long]): Double =
        (for { a <- ids; b <- ids if a < b } yield sim4(emb(a), emb(b))).max
      maxPair(topk) - maxPair(mmr)
    }
    assert(diffs.forall(_ >= 0.0) && diffs.exists(_ > 0.0))
  }

  test("q239: Bradley-Terry MM fit equals a local replay; fit is sane") {
    import graft.operators.RerankPack.BtIters
    val docs = Tables.table(spark, sf0, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    val byId = docs.map(d => d._1 -> d).toMap
    val matches = docs.flatMap { case (id, la, na) =>
      byId.get(id + 1).collect { case (_, lb, nb) if la != lb =>
        val winner = if (na > nb) la else if (nb > na) lb else la
        val (i, j) = if (la < lb) (la, lb) else (lb, la)
        (i, j, winner)
      }
    }
    val m = matches.groupBy(t => (t._1, t._2)).map { case ((i, j), ms) =>
      (i, j, ms.size.toLong, ms.count(_._3 == i).toLong)
    }.toSeq
    val d = m.map { case (i, j, n, wi) => (i, j, n, wi) } ++
      m.map { case (i, j, n, wi) => (j, i, n, n - wi) }
    val players = d.groupBy(_._1).map { case (x, rs) =>
      x -> (rs.map(_._3).sum, rs.map(_._4).sum)
    }
    var p: Map[String, Double] = players.keys.map(_ -> 1.0).toMap
    (1 to BtIters).foreach { _ =>
      val den = d.groupBy(_._1).map { case (x, rs) =>
        x -> rs.map { case (_, y, n, _) =>
          math.round(n * 1e9 / (p(x) + p(y)))
        }.sum
      }
      val praw = players.map { case (x, (_, wins)) =>
        x -> math.round((wins.toDouble * 1e9 / den(x)) * 1e9)
      }
      val tot = praw.values.sum
      val nl = praw.size
      p = praw.map { case (x, pe) => x -> pe.toDouble * nl / tot }
    }
    val expected = players.toSeq.map { case (x, (games, wins)) =>
      (x, games, wins, snap6(p(x)))
    }.sortBy(_._1)
    val got = run("q239_bradley_terry")
      .as[(String, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == expected)
    // mean-normalization: strengths average to 1 (up to the 1e9 lattice)
    assert(math.abs(p.values.sum / p.size - 1.0) < 1e-6)
    // sanity: strengths track win rates — whenever rates are not all
    // equal (they aren't on this corpus: assert that too, so the guard
    // can't silently vacuate), the strongest player's win rate must be
    // STRICTLY above the worst rate, a falsifiable ordering check
    val rates = players.map { case (x, (g, w)) => x -> w.toDouble / g }
    assert(rates.values.max > rates.values.min + 1e-12,
      "test corpus degenerated to all-equal win rates")
    assert(rates(p.maxBy(_._2)._1) > rates.values.min + 1e-12)
  }

  test("q240: bitext margins equal a local replay; hubs score below") {
    import graft.operators.RerankPack.BitextK
    val emb = loadEmb()
    val ex = emb.keys.filter(_ % 2 == 0).toSeq.sorted
    val ey = emb.keys.filter(_ % 2 == 1).toSeq.sorted
    def knn(q: Long, side: Seq[Long]): Seq[(Long, Double)] =
      side.map(id => (id, sim4(emb(id), emb(q))))
        .sortBy { case (id, s) => (-s, id) }.take(BitextK)
    val fKnn = ex.map(x => x -> knn(x, ey)).toMap
    val bKnn = ey.map(y => y -> knn(y, ex)).toMap
    def e4(s: Double): Long = roundAway(s * 1e4)
    val expected = ex.map { x =>
      val (y, s) = fKnn(x).head
      val xsum = fKnn(x).map(t => e4(t._2)).sum
      val ysum = bKnn(y).map(t => e4(t._2)).sum
      val margin = snap6(e4(s).toDouble * (2 * BitextK) / (xsum + ysum))
      (x, y, s, margin, bKnn(y).head._1 == x)
    }
    val got = run("q240_bitext_margin")
      .as[(Long, Long, Double, Double, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got == expected.sortBy(_._1))
    // the 1e4 quantization is fidelity, not semantics: margins recomputed
    // from UN-quantized sims agree to ~1e-3, and both mutual and
    // non-mutual pairs occur
    expected.foreach { case (x, _, _, margin, _) =>
      val raw = fKnn(x).head._2 /
        ((fKnn(x).map(_._2).sum / BitextK +
          bKnn(fKnn(x).head._1).map(_._2).sum / BitextK) / 2)
      assert(math.abs(margin - raw) < 1e-3)
    }
    assert(expected.exists(_._5) && expected.exists(!_._5))
  }

  test("q241: k-means rounds equal a local Lloyd replay; inertia drops") {
    import graft.operators.RerankPack.{KmK, KmRounds}
    val emb = loadEmb()
    val ids = emb.keys.toSeq.sorted
    var cent: Map[Long, Array[Long]] = ids.filter(_ < KmK)
      .map(c => c -> emb(c).map(x => roundAway(x * 1e9))).toMap
    var members: Map[Long, Long] = cent.keys.map(_ -> 0L).toMap
    def assign(c: Map[Long, Array[Long]]): Map[Long, Long] = {
      val cv = c.map { case (k, m) => k -> m.map(_.toDouble / 1e9) }
      ids.map { id =>
        id -> cv.toSeq.map { case (k, v) => (k, sim4(emb(id), v)) }
          .minBy { case (k, s) => (-s, k) }._1
      }.toMap
    }
    (1 to KmRounds).foreach { _ =>
      val asg = assign(cent)
      val byC = asg.groupBy(_._2).map { case (c, m) => c -> m.keys.toSeq }
      val newCent = byC.map { case (c, ms) =>
        val dims = emb(ms.head).length
        c -> Array.tabulate(dims) { d =>
          val s = ms.map(id => roundAway(emb(id)(d) * 1e9)).sum
          roundAway(s.toDouble / ms.size)
        }
      }
      cent = cent.map { case (c, prev) => c -> newCent.getOrElse(c, prev) }
      members = cent.keys.map(c => c -> byC.get(c).map(_.size.toLong)
        .getOrElse(0L)).toMap
    }
    val expected = cent.toSeq.sortBy(_._1).map { case (c, me9) =>
      (c, members(c), me9.sum.toDouble / 1e9,
        java.security.MessageDigest.getInstance("MD5")
          .digest(me9.mkString(",").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(8))
    }
    val got = run("q241_kmeans_rounds")
      .as[(Long, Long, Double, String)].collect().toSeq.sortBy(_._1)
    assert(got == expected)
    // Lloyd property: mean similarity-to-assigned-centroid does not
    // decrease from the initial centroids to the final ones
    def meanSim(c: Map[Long, Array[Long]]): Double = {
      val cv = c.map { case (k, m) => k -> m.map(_.toDouble / 1e9) }
      ids.map { id =>
        cv.values.map(v => sim4(emb(id), v)).max
      }.sum / ids.size
    }
    val init = ids.filter(_ < KmK)
      .map(c => c -> emb(c).map(x => roundAway(x * 1e9))).toMap
    assert(meanSim(cent) >= meanSim(init) - 1e-9)

    // q242 rides the SAME fit: replay the final-round assignment and
    // check the purity audit against it
    val labels = Tables.table(spark, sf0, "embeddings")
      .select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    // the assignment that PRODUCED the final centroids is the one from
    // the last round, i.e. computed against the round-(R-1) centroids
    var cent2: Map[Long, Array[Long]] = init
    var lastAsg: Map[Long, Long] = Map.empty
    (1 to KmRounds).foreach { _ =>
      lastAsg = assign(cent2)
      val byC = lastAsg.groupBy(_._2).map { case (c, m) => c -> m.keys.toSeq }
      cent2 = cent2.map { case (c, prev) =>
        c -> byC.get(c).map { ms =>
          Array.tabulate(prev.length) { d =>
            val sum = ms.map(id => roundAway(emb(id)(d) * 1e9)).sum
            roundAway(sum.toDouble / ms.size)
          }
        }.getOrElse(prev)
      }
    }
    val expPurity = lastAsg.groupBy(_._2).toSeq.map { case (c, m) =>
      val byLabel = m.keys.toSeq.groupBy(labels).map { case (l, xs) =>
        (l, xs.size.toLong)
      }
      val (ml, mn) = byLabel.toSeq.minBy { case (l, n) => (-n, l) }
      (c, m.size.toLong, ml, mn, snap6(mn.toDouble / m.size))
    }.sortBy(_._1)
    val gotPurity = run("q242_cluster_purity")
      .as[(Long, Long, Int, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(gotPurity == expPurity)
    // the audit totals must tile the corpus exactly
    assert(gotPurity.map(_._2).sum == ids.size)
  }
}
