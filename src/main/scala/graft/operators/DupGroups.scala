package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-group clustering: connected components over near-dup PAIRS —
  * the step that turns a pair list (q31/q34's output) into keep/drop
  * decisions. Transitivity matters: if A~B and B~C, all three are one
  * group even when A~C missed the similarity bar, and exactly one
  * representative should survive.
  *
  * Min-label propagation to a fixpoint: every vertex starts labeled with
  * itself; each round a vertex takes the min label among itself and its
  * neighbors; convergence in O(diameter) rounds. Dup clusters are
  * near-cliques (LSH buckets pair their members densely), so the diameter
  * is tiny and the loop exits after 2-3 rounds. Each round is one
  * edge ⋈ label join + a min aggregation — all relational, partial-agg
  * friendly, no driver-side graph. The per-round `localCheckpoint` cuts
  * the otherwise exponentially-growing lineage (the standard iterative-
  * algorithm pattern; at production scale point it at a reliable
  * checkpoint dir). For adversarial graphs with long chains — not dup
  * clusters — the alternating-star variants bound rounds at O(log n); the
  * maxIter cap documents that boundary instead of hiding it.
  */
object DupGroups {

  /** (src, dst) undirected edge list → (id, comp): every vertex that
    * appears in an edge, labeled with the smallest reachable vertex id. */
  def connectedComponents(edges: DataFrame,
                          srcCol: String = "doc_a", dstCol: String = "doc_b",
                          maxIter: Int = 20): DataFrame = {
    // both directions from ONE pass over the (possibly expensive) upstream
    // pair pipeline: explode emits (src,dst)+(dst,src) per input row, so the
    // single checkpoint job runs the upstream once — a self-union would run
    // it once per branch
    val und = edges.select(explode(array(
        struct(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"), col(srcCol).cast("long").as("dst")))).as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
      .distinct()
      .localCheckpoint(true)
    // fold the first propagation round into initialization: every vertex
    // starts at min(self, neighbors) straight off the edge list — for the
    // near-clique graphs dup detection produces, the loop below then
    // usually just CONFIRMS the fixpoint in a single round
    var labels = und.groupBy(col("src")).agg(min(col("dst")).as("_mn"))
      .select(col("src").as("id"), least(col("src"), col("_mn")).as("comp"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    var prevCp = labels // the checkpoint frame each round supersedes
    while (iter < maxIter && !converged) {
      val fromNeighbors = und
        .join(labels.select(col("id").as("dst"), col("comp")), "dst")
        .select(col("src").as("id"), col("comp"), lit(0).as("own"))
      // fold the convergence check into the same aggregation: `own` tags the
      // row carrying the vertex's previous label (exactly one per id), so
      // prev = max(own-weighted comp) rides along and the fixpoint test is a
      // cheap scan of the just-checkpointed result instead of a second join.
      // roll = eager checkpoint + release of the superseded round's blocks
      // (a long-lived session otherwise pins one label table per round)
      val next = graft.plans.Checkpoints.roll(
        labels.select(col("id"), col("comp"), lit(1).as("own"))
          .unionAll(fromNeighbors)
          .groupBy(col("id")).agg(min(col("comp")).as("comp"),
            max(when(col("own") === 1, col("comp"))).as("prev")),
        prevCp)
      // labels only ever decrease, so "no label dropped" == fixpoint
      converged = next.filter(col("comp") < col("prev")).isEmpty
      labels = next.select(col("id"), col("comp"))
      prevCp = next
      iter += 1
    }
    // the edge table is dead once the fixpoint is reached — only the final
    // label table backs the returned frame
    graft.plans.Checkpoints.release(und)
    // a silent early exit would report one real dup group as several,
    // keeping extra "representatives" — fail loud instead
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds; " +
        "the graph has a longer chain than dup clusters should — raise " +
        "maxIter or use an alternating-star variant")
    labels
  }

  /** Per-group summary: (comp, size) for groups of 2+ — the dedup ledger
    * (one keeper per comp, size-1 removals). */
  def groupSizes(components: DataFrame): DataFrame =
    components.groupBy(col("comp")).agg(count(lit(1)).as("size"))
      .filter(col("size") >= 2)
}
