package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Independent plain-Scala re-derivations of the q238/q239 contract
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
    // sanity: the strongest player is not the one with the worst win rate
    val rates = players.map { case (x, (g, w)) => x -> w.toDouble / g }
    assert(rates(p.maxBy(_._2)._1) > rates.values.min - 1e-12)
  }
}
