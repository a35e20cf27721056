package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-domain quota enforcement — the online face of
  * Selection.domainCap (q71) for continuous ingest: admit documents per
  * domain until its cap is reached, across micro-batches, so one crawl
  * source cannot drown the mix no matter how its arrivals are spread
  * over time.
  *
  * State is one Int per domain (the admitted count) — bounded by the
  * domain cardinality, not the corpus, so it never needs a watermark.
  * Within a micro-batch the group's rows are admitted in doc_id order so
  * replays are deterministic; across batches the counter persists (and
  * recovers from the checkpoint with the query).
  *
  * The batch twin (domainCap's rank-limit window) and this operator
  * admit the same NUMBER per domain; they may admit different members
  * when arrival order differs from the batch ordering — inherent to
  * online admission, which cannot un-admit an early arrival when a
  * better-ranked one lands later. Batch≡stream agreement on the full
  * admitted multiset therefore holds when arrival order matches the
  * batch order (spec-asserted).
  */
object StreamingQuota {

  case class DocArrival(doc_id: Long, domain: String)
  case class Admitted(doc_id: Long, domain: String, rank_in_domain: Int)

  /** docs stream (doc_id, domain) → admitted rows with their per-domain
    * admission rank (1-based). */
  def enforce(docs: DataFrame, cap: Int): Dataset[Admitted] = {
    require(cap >= 1, "cap must be >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("doc_id", "domain").as[DocArrival]
      .groupByKey(_.domain)
      .flatMapGroupsWithState[Int, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, rows: Iterator[DocArrival], state: GroupState[Int]) =>
          var admitted = state.getOption.getOrElse(0)
          val out = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
            if (admitted < cap) {
              admitted += 1
              Some(Admitted(d.doc_id, domain, admitted))
            } else None
          }
          state.update(admitted)
          out.iterator
      }
  }
}
