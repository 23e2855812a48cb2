package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One document's pack assignment (top-level for the Dataset encoder). */
final case class PackAssign(doc_id: Long, lang: String, shard: Long,
                            tokens: Long, pack_id: Long)

/** Sequence packing for training: concatenate documents into fixed
  * token-budget packs (context windows) with minimal padding waste.
  *
  * Semantics: greedy sequential first-fit in doc_id order WITHIN each
  * (group, shard) — the standard deterministic packing used by
  * training-data pipelines, where reproducibility beats the marginal
  * fill-rate of bin-packing heuristics. A document larger than the budget
  * occupies a pack alone (truncation is the trainer's decision, not the
  * packer's).
  *
  * Sharding IS the scale contract: packing is sequential per group by
  * nature, so the group key is (groupCol, shard) with shard = a
  * deterministic content-addressed hash bucket of doc_id
  * ([[Sampling.hashUnit]] — reproducible across runs, engines and
  * repartitionings, and exactly reproducible by the DuckDB oracle). Pack
  * ids are scoped PER SHARD: (lang, shard, pack_id) names a pack. At
  * `shards = 1` this degrades to the whole-group sequential chain; at
  * corpus scale `shards` bounds every sequential chain to ~|group|/shards
  * documents so no language becomes a single straggler task. Cross-shard
  * residual waste is bounded by (shards − 1) tail packs per group —
  * negligible against a corpus.
  *
  * Plan shape: hash-repartition by (group, shard), sort within partitions,
  * then ONE streaming pass per partition (`mapPartitions` with O(1) state —
  * current group, running total, pack counter). Nothing is buffered, so
  * partition size is unbounded.
  */
object Packing {

  /** Seed for the shard hash — embedded in the DuckDB oracle too. */
  val ShardSeed = "pack"

  def packDocuments(docs: DataFrame, budget: Long,
                    groupCol: String = "lang", shards: Int = 1): Dataset[PackAssign] = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = docs.sparkSession
    import spark.implicits._
    // Null group keys or texts are data bugs, not packable rows: a null
    // group would collide with the group-change sentinel below (and a null
    // token count crashes the encoder with an opaque error) — reject them
    // loudly, like Sampling does for null keys.
    def checked(c: Column, what: String, tpe: String): Column =
      when(c.isNull,
        raise_error(lit(s"packing: $what must not be null")).cast(tpe))
        .otherwise(c.cast(tpe))
    docs.select(col("doc_id"),
        checked(col(groupCol), s"group key $groupCol", "string").as("lang"),
        floor(Sampling.hashUnit(col("doc_id"), ShardSeed) * shards)
          .cast("long").as("shard"),
        checked(size(TextAnalysis.tokens(col("text"))).cast("long"),
          "text", "long").as("tokens"))
      .repartition(col("lang"), col("shard"))
      .sortWithinPartitions(col("lang"), col("shard"), col("doc_id"))
      .as[(Long, String, Long, Long)]
      .mapPartitions { it =>
        // (group, shard) chains are contiguous after the sort; a chain never
        // spans partitions because the repartition hashes on both keys
        var curLang: String = null
        var curShard = -1L
        var acc = 0L
        var pack = 0L
        it.map { case (id, lang, shard, t) =>
          if (lang != curLang || shard != curShard) {
            curLang = lang; curShard = shard; pack = 1L; acc = t
          }
          else if (acc + t > budget) { pack += 1L; acc = t }
          else acc += t
          PackAssign(id, lang, shard, t, pack)
        }
      }
  }
}
