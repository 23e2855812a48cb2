package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Curation v2 — the end-to-end modern pretraining-data pipeline as ONE
  * declarative plan, composing the separately-gated operators:
  *
  *   1. lexical MinHash dedup keepers ([[Dedup.deduplicated]]),
  *   2. benchmark decontamination ([[Dedup.contaminated]] anti-join),
  *   3. a quality floor ([[TextAnalysis.qualityScore]]) — optionally
  *      followed by the MODEL-based floor
  *      ([[TextAnalysis.modelQualityScore]], the fastText/CCNet-style
  *      frozen-weight classifier stage),
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
/** The build parameters a [[ReleaseDedupIndex]] was computed under — the
  * artifact's self-describing metadata (ADVICE r13 medium): the MinHash
  * signature is banding-sized by `minhashThreshold`, the shingle sets by
  * `shingleK`, and the SRP signature by `srpSeed`, so an index restored
  * at DIFFERENT parameters would silently under-dedup (out-of-range sig
  * positions → null band keys, non-matching chunks) rather than error.
  * Persisted next to the relations by [[graft.Io.writeReleaseIndex]] and
  * REQUIRED to match the caller's parameters at every use site
  * ([[Curation.deltaReleaseAssignments]], [[Curation.updateReleaseIndex]]). */
final case class IndexMeta(minhashThreshold: Double, shingleK: Int,
                           srpSeed: Long)

/** The persisted dedup-index artifact of a shipped release — the pair of
  * relations the CROSS legs of [[Curation.deltaReleaseAssignments]] need
  * about the prior release, with every per-document/per-vector kernel
  * already paid: [[graft.ops.Dedup.buildLexIndex]]'s
  * (doc_id, shingles, sig) and [[graft.ops.Similarity.buildSemIndex]]'s
  * (vec_id, embedding, norm, sig), plus the [[IndexMeta]] they were built
  * under. Ships next to the release shards
  * ([[graft.Io.writeReleaseIndex]]/[[graft.Io.readReleaseIndex]]); at
  * re-cut time it is filtered to the still-retained ids (an id-keyed
  * semi-join — no re-hashing) so a delta run's index-side cost is
  * bucket-derivation arithmetic plus the verify joins, never a
  * corpus-scale hash pass. The AnnIndex restore discipline applied to
  * the release's dedup state. `meta` is None only for pre-metadata
  * artifacts read back from disk; parameter consistency then falls to
  * the signature-length guard in the banding arithmetic. */
final case class ReleaseDedupIndex(lexical: DataFrame, semantic: DataFrame,
                                   meta: Option[IndexMeta] = None)

object Curation {

  /** Eager flat-plan stage boundary (the [[deltaReleaseAssignments]] body
    * discipline, shared): materialize into an RDD-backed copy whose blocks
    * the ContextCleaner frees once the frame is discarded. Used on id- or
    * delta-sized relations that feed MULTIPLE downstream consumers — each
    * consumer would otherwise re-run the whole upstream lineage (noop/
    * write actions do not cache). */
  private def mat(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.Bridge
      .materializedAuto(df, StorageLevel.MEMORY_AND_DISK)

  /** Build the [[ReleaseDedupIndex]] for a corpus being shipped — run it
    * over the RELEASE's docs/embeddings at release-build time, write with
    * [[graft.Io.writeReleaseIndex]]. `minhashThreshold` must match the
    * threshold the future delta runs will use (the MinHash signature is
    * banding-sized). */
  def buildReleaseIndex(docs: DataFrame, embeddings: DataFrame,
                        minhashThreshold: Double = 0.5,
                        shingleK: Int = 3,
                        srpSeed: Long = 42L): ReleaseDedupIndex =
    ReleaseDedupIndex(
      Dedup.buildLexIndex(docs, minhashThreshold, shingleK),
      Similarity.buildSemIndex(embeddings, srpSeed),
      Some(IndexMeta(minhashThreshold, shingleK, srpSeed)))

  /** Produce the NEXT release's [[ReleaseDedupIndex]] from a delta re-cut
    * (VERDICT r13 #1) — the [[graft.ops.Similarity.AnnIndex]].append
    * discipline applied to the release's dedup state, closing the index
    * lifecycle: without it, q148's restored-index economics amortize over
    * exactly one generation because the re-cut consumes an index but
    * never produces the next one.
    *
    * Given the prior release's index, the NEW release's doc-level
    * assignment frame ([[deltaReleaseAssignments]]'s output = retained ∪
    * fresh) and the two corpus snapshots the re-cut moved between, the
    * new index is
    *
    *   - the prior relations filtered to the shipped ids whose content is
    *     UNCHANGED between the snapshots ([[graft.ops.Profile.corpusDelta]]
    *     fingerprints — a changed doc re-admitted in the same generation
    *     must NOT reuse its stale shingles/sigs; id-keyed LEFT SEMI joins,
    *     duplicate-proof, no per-character/per-vector work), unioned with
    *   - [[graft.ops.Dedup.buildLexIndex]] /
    *     [[graft.ops.Similarity.buildSemIndex]] over every other shipped
    *     doc (added, changed, or missing from the prior relations) — the
    *     kernels run delta-sized.
    *
    * The only corpus-sized work is the fingerprint scan — the same
    * irreducible term the re-cut itself pays. Bit-identical to
    * `buildReleaseIndex` over the new release's full corpus slice (OpsSpec
    * pins set equality, and the q151 gate pins a second-generation re-cut
    * against the appended, parquet-round-tripped index to the exact
    * oracle), at delta cost instead of corpus cost. Parameters must match
    * the prior index's [[IndexMeta]] — a mismatch would union
    * incompatible signatures and silently under-dedup. */
  /** `sharedDelta`: the weekly loop's re-cut already computed (and the
    * caller typically materialized) exactly the
    * `Profile.corpusDelta(prevDocs, curDocs, "doc_id", Seq("text"))`
    * status frame this update needs — pass it to skip the two corpus-
    * sized fingerprint re-scans (the [[graft.ops.Profile
    * .sourceStatsDelta]] sharedDelta discipline). The caller GUARANTEES
    * it equals that expression's result; results are bit-identical by
    * construction. */
  def updateReleaseIndex(prior: ReleaseDedupIndex, newAssign: DataFrame,
                         prevDocs: DataFrame, curDocs: DataFrame,
                         curEmbeddings: DataFrame,
                         minhashThreshold: Double = 0.5,
                         shingleK: Int = 3,
                         srpSeed: Long = 42L,
                         sharedDelta: Option[DataFrame] = None): ReleaseDedupIndex = {
    val meta = IndexMeta(minhashThreshold, shingleK, srpSeed)
    prior.meta.foreach(m => require(m == meta,
      s"updateReleaseIndex parameter mismatch: prior index was built " +
        s"under $m, update requested under $meta — appending would mix " +
        "incompatible signatures (silent under-dedup)"))
    // Both id relations are consumed by SEVERAL joins below (ids: reuse +
    // both fresh semi-joins; reuseIds: both kept semi-joins, and through
    // them both fresh anti-joins). `newAssign` is typically the LAZY tail
    // of a delta re-cut and corpusDelta re-scans two corpus snapshots —
    // materialize each ONCE (id-sized blocks, ContextCleaner-freed) so the
    // artifact write pays one evaluation per input, not one per consumer
    // (measured on the q153 gate: updateReleaseIndex + write dropped ~2×).
    val ids = mat(newAssign.select("doc_id"))
    val reuseIds = mat(ids.join(
      sharedDelta.getOrElse(
          Profile.corpusDelta(prevDocs, curDocs, "doc_id", Seq("text")))
        .filter(col("status") === "unchanged").select("doc_id"),
      Seq("doc_id"), "left_semi"))
    val keptLex = prior.lexical.join(reuseIds, Seq("doc_id"), "left_semi")
    val keptSem = prior.semantic.join(
      reuseIds.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    // recompute = shipped minus reused, per relation: covers added and
    // changed docs, and shipped docs the prior relation never carried
    // (shingle-less then, or embedded only now)
    val freshDocs = curDocs
      .join(ids, Seq("doc_id"), "left_semi")
      .join(keptLex.select("doc_id"), Seq("doc_id"), "left_anti")
    val freshEmb = curEmbeddings
      .join(ids.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
      .join(keptSem.select("vec_id"), Seq("vec_id"), "left_anti")
    ReleaseDedupIndex(
      keptLex
        .unionByName(Dedup.buildLexIndex(freshDocs, minhashThreshold, shingleK)),
      keptSem
        .unionByName(Similarity.buildSemIndex(freshEmb, srpSeed)),
      Some(meta))
  }

  /** Stages 1–2 shared by [[curateV2]] and [[releasePipeline]]: the
    * persisted lexical-curation survivor frame (full doc columns) and the
    * SemDeDup keeper doc_ids within it. `modelFloor` threads the optional
    * classifier stage — the comparison is on the ROUNDED score, exactly
    * what an oracle twin computes. */
  private def curatedKeepers(docs: DataFrame, embeddings: DataFrame,
                             minhashThreshold: Double, benchmarkSource: String,
                             qualityFloor: Double, modelFloor: Option[Double],
                             semanticThreshold: Double, exactSemantic: Boolean,
                             contamShingleK: Int): (DataFrame, DataFrame) = {
    val deduped = Dedup.deduplicated(docs,
      Dedup.minHashPairs(docs, minhashThreshold))
    val contaminatedIds = Dedup.contaminated(
        docs.filter(col("source") =!= benchmarkSource),
        docs.filter(col("source") === benchmarkSource), contamShingleK)
      .select("doc_id")
    val lexical = deduped.filter(col("source") =!= benchmarkSource)
      .join(contaminatedIds, Seq("doc_id"), "left_anti")
      .filter(TextAnalysis.qualityScore(col("text")) >= qualityFloor)
    // three+ consumers (induced pair graph, quality projection, budget
    // input, packing re-attach) — pin the expensive lexical lineage once
    val stage1 = modelFloor
      .foldLeft(lexical)((df, f) =>
        df.filter(TextAnalysis.modelQualityScore(col("text")) >= f))
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
    (stage1, sem.filter(col("keep") === 1).select("doc_id"))
  }

  def curateV2(docs: DataFrame, embeddings: DataFrame,
               tokenBudget: Long,
               minhashThreshold: Double = 0.5,
               benchmarkSource: String = "src0",
               qualityFloor: Double = 0.4,
               semanticThreshold: Double = 0.9,
               exactSemantic: Boolean = false,
               contamShingleK: Int = 8): DataFrame = {
    val (stage1, semKeepers) = curatedKeepers(docs, embeddings,
      minhashThreshold, benchmarkSource, qualityFloor, None,
      semanticThreshold, exactSemantic, contamShingleK)
    Sampling.tokenBudgetSelect(stage1.join(semKeepers, "doc_id"), tokenBudget)
  }

  /** The full training-data RELEASE chain as ONE declarative plan — what
    * [[curateV2]] is to curation, this is to the whole pipeline: proof the
    * separately-gated operators compose without a driver-side
    * materialization between stages (reference anchor: the per-date
    * everything-in-one-process e2e, pipeline.py:200-239).
    *
    *   1–2. [[curatedKeepers]]: lexical dedup → decontamination → quality
    *        floor (+ optional model floor) → SemDeDup keepers;
    *   3. temperature-α domain rebalance over `lang`
    *      ([[Sampling.temperatureSample]] — downsample-only,
    *      content-addressed);
    *   4. best-quality token-budget cut ([[Sampling.tokenBudgetSelect]] —
    *      distributed running sum, never a one-task window);
    *   5. sequence packing ([[Packing.packDocuments]] — sharded greedy
    *      first-fit chains);
    *   6. deterministic global shuffle of the PACKS
    *      ([[Sampling.shuffleOrder]] over the pack key — range-partitioned
    *      zipWithIndex, no single-task window);
    *   7. round-robin pack→output-shard assignment (`shuffle_pos mod
    *      outShards` — balanced by construction because the shuffle order
    *      is hash-uniform) and the per-shard release MANIFEST: pack/doc/
    *      token counts plus the source mix as a canonical sorted
    *      "source:count" string.
    *
    * Scale shape: the corpus-sized stages are exactly the gated operators'
    * plans (their shuffles are the irreducible cost); everything after
    * packing operates on the PACK relation (|selected docs| / docs-per-pack
    * rows) and the manifest folds are outShards-sized. The one pin is
    * stage 1 (see the cache contract above); nothing else is persisted or
    * collected beyond the operators' own sanctioned 1-row scalars.
    *
    * Output: (out_shard, n_packs, n_docs, n_tokens, source_mix), one row
    * per non-empty output shard. */
  def releasePipeline(docs: DataFrame, embeddings: DataFrame,
                      tokenBudget: Long,
                      packBudget: Long = 256,
                      packShards: Int = 1,
                      outShards: Int = 4,
                      alpha: Double = 0.5,
                      mixSeed: String = "relmix",
                      shuffleSeed: String = "relshuf",
                      minhashThreshold: Double = 0.5,
                      benchmarkSource: String = "src0",
                      qualityFloor: Double = 0.4,
                      modelFloor: Option[Double] = None,
                      semanticThreshold: Double = 0.9,
                      exactSemantic: Boolean = false,
                      contamShingleK: Int = 8): DataFrame = {
    // the manifest fold scans the assignment twice (per-source stats +
    // the distinct pack-key count) — materialize the doc-level frame once
    // for this manifest-only caller (narrow rows; the WRITE path instead
    // streams the same frame to parquet shards and folds the manifest
    // from it there, graft.Io.writeReleaseShards)
    selectManifest(mat(releaseAssignments(docs, embeddings, tokenBudget,
      packBudget, packShards, outShards, alpha, mixSeed, shuffleSeed,
      minhashThreshold, benchmarkSource, qualityFloor, modelFloor,
      semanticThreshold, exactSemantic, contamShingleK)))
  }

  /** The DOC-LEVEL release assignment behind [[releasePipeline]]: one row
    * per shipped document — (doc_id, lang, shard, tokens, pack_id,
    * pack_key, source, shuffle_pos, out_shard). This is what a release
    * WRITES ([[graft.Io.writeReleaseShards]]): rows ordered by the packs'
    * deterministic shuffle position within each output shard, so the
    * artifact bytes are reproducible run-over-run. The manifest
    * ([[releasePipeline]]) is a fold over this frame. */
  def releaseAssignments(docs: DataFrame, embeddings: DataFrame,
                         tokenBudget: Long,
                         packBudget: Long = 256,
                         packShards: Int = 1,
                         outShards: Int = 4,
                         alpha: Double = 0.5,
                         mixSeed: String = "relmix",
                         shuffleSeed: String = "relshuf",
                         minhashThreshold: Double = 0.5,
                         benchmarkSource: String = "src0",
                         qualityFloor: Double = 0.4,
                         modelFloor: Option[Double] = None,
                         semanticThreshold: Double = 0.9,
                         exactSemantic: Boolean = false,
                         contamShingleK: Int = 8): DataFrame = {
    require(outShards >= 1, s"outShards must be >= 1, got $outShards")
    val (stage1, semKeepers) = curatedKeepers(docs, embeddings,
      minhashThreshold, benchmarkSource, qualityFloor, modelFloor,
      semanticThreshold, exactSemantic, contamShingleK)
    // kept feeds FOUR scans (temperatureSample's count pass + its join
    // back, tokenBudgetSelect's range-partitioner sample + its real pass)
    // — without a boundary each re-runs the SemDeDup window + quality
    // projection. Flat-materialized (selected-docs-sized rows,
    // ContextCleaner-freed), the deltaReleaseAssignments discipline.
    val kept = mat(stage1.join(semKeepers, "doc_id"))
    val mixed = Sampling.temperatureSample(kept, "lang", "doc_id", alpha, mixSeed)
    val sel = Sampling.tokenBudgetSelect(mixed, tokenBudget)
    // J3 re-attach against the pinned survivor frame: packing needs text
    // (token recount) + lang; the budget output carries only ids
    val selDocs = stage1.join(sel.select("doc_id"), "doc_id")
    val packs = Packing.packDocuments(selDocs, packBudget, "lang", packShards)
      .toDF()
    val packKey = concat_ws("/", col("lang"), col("shard"), col("pack_id"))
    // consumed twice (the distinct pack-key shuffle relation + the final
    // re-attach) — each would re-run the packing repartition+sort pass
    val packRel = mat(packs.withColumn("pack_key", packKey))
    val assigned = Sampling
      .shuffleOrder(packRel.select("pack_key").distinct(), "pack_key", shuffleSeed)
      .withColumn("out_shard", pmod(col("shuffle_pos"), lit(outShards.toLong)))
      .select("pack_key", "shuffle_pos", "out_shard")
    packRel
      .join(stage1.select("doc_id", "source"), "doc_id")
      .join(assigned, "pack_key")
  }

  /** INCREMENTAL (delta) release build — [[releaseAssignments]]'s weekly
    * re-cut without the full-rebuild cost (VERDICT r12 #1): given the
    * PRIOR release's doc-level assignment frame and the two corpus
    * snapshots it moved between, re-run curation only over the
    * added+changed slice and keep unchanged packs' assignments stable.
    * The `newAgainstIndex` (q123) / frozen-quantizer (q133) ingest
    * discipline applied at release level; reference anchor: the 1-day
    * incremental grain the reference deployment is built on
    * (cloud_function/main.py:34,103-121).
    *
    * Semantics, stage by stage (the oracle replays exactly this order):
    *
    *   1. delta classification — [[graft.ops.Profile.corpusDelta]] on
    *      `text` fingerprints. RETAINED = prior assignment rows whose doc
    *      is `unchanged`, passed through VERBATIM (pack stability: a
    *      trainer resuming from the prior release re-reads identical
    *      packs). Removed/changed docs' prior rows drop — their packs ship
    *      thinner rather than repacking (repacking would invalidate every
    *      retained position; a full rebuild is the periodic compaction).
    *   2. candidates = `added` + `changed` docs from the NEW snapshot
    *      (changed docs re-enter with their new text), benchmark source
    *      excluded.
    *   3. heuristic quality floor, then the optional model floor
    *      ([[TextAnalysis.modelQualityScore]]).
    *   4. decontamination against the NEW snapshot's benchmark docs
    *      ([[Dedup.contaminated]] anti-join).
    *   5. cross-side lexical dedup: candidates vs the RETAINED release
    *      docs (never re-pairs the release against itself), and
    *   6. within-delta lexical dedup — both legs in one
    *      [[Dedup.newAgainstIndexAndSelf]] pass (semantically
    *      [[Dedup.newAgainstIndex]] then [[Dedup.deduplicated]] over
    *      [[Dedup.minHashPairs]], with the delta shingle-hashed once).
    *   7. cross-side semantic decontamination: candidate embeddings vs
    *      retained embeddings ([[Similarity.semanticContaminatedLsh]] —
    *      cross-side-only SRP candidates).
    *   8. within-delta SemDeDup ([[Similarity.semanticDedupLsh]] keepers).
    *   9. delta token budget ([[Sampling.tokenBudgetSelect]] — the
    *      re-cut's own addition budget; the base corpus spent its budget
    *      at the base release).
    *  10. packing into NEW generation-tagged packs
    *      ([[Packing.packDocuments]]; pack_key prefixed with
    *      `generation` so keys can never collide with prior packs), a
    *      deterministic shuffle of the new packs APPENDED after the prior
    *      release's max shuffle_pos (prefix stability), and round-robin
    *      out_shard assignment of the new positions. `outShards` should
    *      match the prior release's.
    *
    * Scale shape: stage 1 is one fingerprint scan per snapshot (md5
    * digests through the join, never bodies) — the only corpus-sized
    * work. Every curation kernel (3-9) runs on the DELTA (plus one
    * bucket/SRP pass over the retained side for the cross joins, linear
    * and shuffle-light), and packing/shuffle/manifest are delta-pack-
    * sized: cost scales with the CHANGE, not the corpus (measured in
    * DESIGN §10's replica table). Stage boundaries are eagerly
    * materialized into flat-plan RDD-backed copies (see the body
    * comment) — delta-/id-sized blocks, freed by the ContextCleaner once
    * the returned frame is discarded.
    *
    * Output: the same doc-level assignment schema as
    * [[releaseAssignments]] — retained rows ∪ newly packed rows — ready
    * for [[manifestOf]] / [[graft.Io.writeReleaseShards]]. */
  def deltaReleaseAssignments(prevAssign: DataFrame,
                              prevDocs: DataFrame,
                              curDocs: DataFrame,
                              curEmbeddings: DataFrame,
                              deltaTokenBudget: Long,
                              packBudget: Long = 256,
                              packShards: Int = 1,
                              outShards: Int = 4,
                              shuffleSeed: String = "relshuf",
                              minhashThreshold: Double = 0.5,
                              benchmarkSource: String = "src0",
                              qualityFloor: Double = 0.4,
                              modelFloor: Option[Double] = None,
                              semanticThreshold: Double = 0.9,
                              contamShingleK: Int = 8,
                              generation: String = "d1",
                              index: Option[ReleaseDedupIndex] = None,
                              sharedDelta: Option[DataFrame] = None): DataFrame = {
    require(outShards >= 1, s"outShards must be >= 1, got $outShards")
    // A restored index must have been built under the parameters THIS
    // re-cut dedups at (ADVICE r13 medium): the cross legs below consume
    // the artifact's signatures at this threshold / shingle k / SRP seed,
    // and a mismatch under-dedups silently. Meta-less (pre-metadata)
    // artifacts fall through to the signature-length guard in the banding
    // arithmetic, which catches the threshold class but not a seed drift.
    index.flatMap(_.meta).foreach { m =>
      val expected = IndexMeta(minhashThreshold, shingleK = 3, srpSeed = 42L)
      require(m == expected,
        s"deltaReleaseAssignments: restored index was built under $m but " +
          s"this re-cut dedups under $expected — rebuild the index or " +
          "match the parameters")
    }
    // ONE narrow scan of the prior assignment frame, up front, yields both
    // prior-release scalars: the max shuffle position the new packs append
    // after, and the generation-collision guard (VERDICT r13 #3) — a
    // `generation` already present in prior pack keys would collide new
    // pack_keys with shipped ones, so fail before any delta work runs.
    // 1-row bounded collect (learned-literal discipline); -1 on an empty
    // prior release so positions start at 0.
    val prevHead = prevAssign.agg(
      coalesce(max("shuffle_pos"), lit(-1L)),
      count(when(col("pack_key").startsWith(generation + "/"), 1))).head()
    val prevMax = prevHead.getLong(0)
    require(prevHead.getLong(1) == 0L,
      s"deltaReleaseAssignments: generation '$generation' already tags " +
        s"${prevHead.getLong(1)} prior pack keys — each re-cut needs a " +
        "fresh generation label or new pack_keys would collide with " +
        "shipped packs")
    // Stage boundaries are EAGERLY MATERIALIZED into RDD-backed flat-plan
    // copies ([[org.apache.spark.sql.graftbridge.Bridge.materialized]],
    // the dedupClusters discipline) rather than plain persist()ed: the
    // chain is ~10 composed operators deep and each boundary's logical
    // plan would otherwise EMBED every upstream boundary's full tree —
    // the tree doubles per stage, and Spark renders the whole analyzed
    // plan to a string per action (SparkListenerSQLExecutionStart), which
    // measured ~88 s of DRIVER time per run at sf0.1 (jstack: all samples
    // in TreeNode.generateTreeString) against ~17 s of actual stage wall.
    // The flat LogicalRDD leaves keep every downstream plan
    // boundary-sized, and the eager count means the chain's eager
    // internals (driver union-find, running-sum offsets, zipWithIndex)
    // read blocks instead of re-running the admission prefix. All
    // materialized relations are delta- or id-sized. Blocks are
    // RDD-level: spark.catalog.clearCache() does NOT free them — they are
    // freed by the ContextCleaner once the returned frame is discarded
    // (the verify/bench lifecycle), or by a caller holding no reference.
    // (`mat` is the object-level shared helper.)
    // `sharedDelta` (same contract as updateReleaseIndex / sourceStatsDelta):
    // a caller that already computed-and-materialized THIS corpusDelta
    // frame passes it in, skipping the chain's two corpus-sized fingerprint
    // scans — the caller guarantees it equals the expression below.
    val status = sharedDelta.getOrElse(mat(
      Profile.corpusDelta(prevDocs, curDocs, "doc_id", Seq("text"))))
    val retained = mat(prevAssign.join(
      status.filter(col("status") === "unchanged").select("doc_id"), "doc_id"))
    // the shipped docs the delta dedups against, with their (identical-
    // by-definition) current text
    val retainedDocs = curDocs.join(retained.select("doc_id"), "doc_id")
    val candidates = curDocs
      .join(status.filter(col("status").isin("added", "changed"))
        .select("doc_id"), "doc_id")
      .filter(col("source") =!= benchmarkSource)
      .filter(TextAnalysis.qualityScore(col("text")) >= qualityFloor)
    val floored = modelFloor
      .foldLeft(candidates)((df, f) =>
        df.filter(TextAnalysis.modelQualityScore(col("text")) >= f))
    val contamIds = Dedup.contaminated(floored,
        curDocs.filter(col("source") === benchmarkSource), contamShingleK)
      .select("doc_id")
    val cand = mat(floored.join(contamIds, Seq("doc_id"), "left_anti"))
    // Cross legs: with a restored [[ReleaseDedupIndex]] the retained side
    // is the persisted artifact filtered to the retained ids (id-keyed
    // semi-join) — identical results, no corpus re-hash per re-cut.
    val lexSurv = mat(index match {
      case Some(ix) => Dedup.newAgainstLexIndexAndSelf(cand,
        ix.lexical.join(retained.select("doc_id"), "doc_id"),
        minhashThreshold)
      case None =>
        Dedup.newAgainstIndexAndSelf(cand, retainedDocs, minhashThreshold)
    })
    val lexEmb = curEmbeddings.join(
      lexSurv.select(col("doc_id").as("vec_id")), "vec_id")
    val semHits = (index match {
      case Some(ix) => Similarity.semanticContaminatedLshIndexed(lexEmb,
        ix.semantic.join(retained.select(col("doc_id").as("vec_id")),
          "vec_id"),
        semanticThreshold)
      case None =>
        val retEmb = curEmbeddings.join(
          retained.select(col("doc_id").as("vec_id")), "vec_id")
        Similarity.semanticContaminatedLsh(lexEmb, retEmb, semanticThreshold)
    }).select("doc_id")
    val semCross = mat(lexSurv.join(semHits, Seq("doc_id"), "left_anti"))
    val semEmb = curEmbeddings.join(
      semCross.select(col("doc_id").as("vec_id")), "vec_id")
    // admitted has ONE consumer (the budget cut), whose running-sum
    // primitive pins its own input across the range-sampling double pass —
    // a mat() here would only add a redundant materialization job (the
    // SemDeDup labels behind the keep relation are already eager and
    // RDD-backed, so the plan stays boundary-sized without it)
    val admitted = semCross.join(
      Similarity.semanticDedupLsh(semCross, semEmb, semanticThreshold)
        .filter(col("keep") === 1).select("doc_id"), "doc_id")
    val sel = Sampling.tokenBudgetSelect(admitted, deltaTokenBudget)
    val selDocs = cand.join(sel.select("doc_id"), "doc_id")
    val packs = Packing.packDocuments(selDocs, packBudget, "lang", packShards)
      .toDF()
    val packKey = concat_ws("/", lit(generation), col("lang"), col("shard"),
      col("pack_id"))
    val packRel = mat(packs.withColumn("pack_key", packKey))
    val assigned = Sampling
      .shuffleOrder(packRel.select("pack_key").distinct(), "pack_key",
        shuffleSeed)
      .withColumn("shuffle_pos", col("shuffle_pos") + lit(prevMax + 1L))
      .withColumn("out_shard", pmod(col("shuffle_pos"), lit(outShards.toLong)))
      .select("pack_key", "shuffle_pos", "out_shard")
    val fresh = packRel
      .join(curDocs.select("doc_id", "source"), "doc_id")
      .join(assigned, "pack_key")
    retained.unionByName(fresh.select(retained.columns.map(col).toSeq: _*))
  }

  /** The per-shard manifest fold over [[releaseAssignments]]. */
  private def selectManifest(docShard: DataFrame): DataFrame = {
    val bySrc = docShard.groupBy("out_shard", "source")
      .agg(count(lit(1)).as("__n"), sum("tokens").as("__t"))
    val packCnt = docShard.select("out_shard", "pack_key").distinct()
      .groupBy("out_shard").agg(count(lit(1)).as("n_packs"))
    bySrc.groupBy("out_shard")
      .agg(sum("__n").as("n_docs"), sum("__t").as("n_tokens"),
        array_join(
          transform(array_sort(collect_list(struct(col("source"), col("__n")))),
            s => concat(s.getField("source"), lit(":"), s.getField("__n"))),
          ",").as("source_mix"))
      .join(packCnt, "out_shard")
      .select("out_shard", "n_packs", "n_docs", "n_tokens", "source_mix")
  }

  /** Public manifest fold for callers that already hold an assignment
    * frame (e.g. to write manifest + shards from ONE computed assignment —
    * [[graft.Io.writeReleaseShards]] composes exactly this way). */
  def manifestOf(assignments: DataFrame): DataFrame =
    selectManifest(assignments)
}
