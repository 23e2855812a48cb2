package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Curation v2 — the end-to-end modern pretraining-data pipeline as ONE
  * declarative plan, composing the separately-gated operators:
  *
  *   1. lexical MinHash dedup keepers ([[Dedup.deduplicated]]),
  *   2. benchmark decontamination ([[Dedup.contaminated]] anti-join),
  *   3. a quality floor ([[TextAnalysis.qualityScore]]),
  *   4. SemDeDup on the embedding modality WITHIN the survivors
  *      ([[Similarity.semanticDedupLsh]] — see `exactSemantic`),
  *   5. the best-quality token-budget cut ([[Sampling.tokenBudgetSelect]],
  *      a distributed running sum).
  *
  * The semantic stage defaults to the LSH composition — SRP band/full-
  * signature star edges with exact cosine verification, O(survivors ×
  * bands) candidate edges — so the production pipeline NEVER enumerates
  * the |survivors|² pair relation (survivors grow linearly with the
  * corpus, so the exact kernel is still quadratic at scale; VERDICT r8
  * item 2). `exactSemantic = true` swaps in [[Similarity.semanticDedup]]'s
  * brute-force pair kernel — the oracle-baseline form for small-corpus
  * verification, with recall guaranteed at ANY threshold rather than the
  * SRP curve.
  *
  * Cache contract: stage 1 (the lexical-curation survivor set) is pinned
  * MEMORY_AND_DISK because three downstream consumers (the induced pair
  * graph, the quality projection, the budget input) would each recompute
  * the whole MinHash + decontamination lineage otherwise. The pin must
  * outlive the RETURNED frame's evaluation (it is consumed lazily), so the
  * CALLER frees it after materializing the result —
  * `spark.catalog.clearCache()`, the verify/bench harness discipline, or
  * targeted unpersist in a long-lived session. Same contract as
  * [[Dedup]]'s persisted shingle sets and [[Similarity.pqTopK]]'s code
  * index.
  */
object Curation {

  def curateV2(docs: DataFrame, embeddings: DataFrame,
               tokenBudget: Long,
               minhashThreshold: Double = 0.5,
               benchmarkSource: String = "src0",
               qualityFloor: Double = 0.4,
               semanticThreshold: Double = 0.9,
               exactSemantic: Boolean = false,
               contamShingleK: Int = 8): DataFrame = {
    val deduped = Dedup.deduplicated(docs,
      Dedup.minHashPairs(docs, minhashThreshold))
    val contaminatedIds = Dedup.contaminated(
        docs.filter(col("source") =!= benchmarkSource),
        docs.filter(col("source") === benchmarkSource), contamShingleK)
      .select("doc_id")
    // three consumers (induced pair graph, quality projection, budget
    // input) — pin the expensive lexical-curation lineage once
    val stage1 = deduped.filter(col("source") =!= benchmarkSource)
      .join(contaminatedIds, Seq("doc_id"), "left_anti")
      .filter(TextAnalysis.qualityScore(col("text")) >= qualityFloor)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // SemDeDup over the SURVIVORS' embeddings only (the induced pair
    // graph): dedupe among the docs being kept — the correct curation
    // semantics, and the candidate volume scales with the survivor set,
    // not the whole embedding table
    val survEmb = embeddings.join(
      stage1.select(col("doc_id").as("vec_id")), Seq("vec_id"))
    val sem =
      if (exactSemantic) Similarity.semanticDedup(stage1, survEmb, semanticThreshold)
      else Similarity.semanticDedupLsh(stage1, survEmb, semanticThreshold)
    val semKeepers = sem.filter(col("keep") === 1).select("doc_id")
    Sampling.tokenBudgetSelect(stage1.join(semKeepers, "doc_id"), tokenBudget)
  }
}
