package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One document's pack assignment (top-level for the Dataset encoder). */
final case class PackAssign(doc_id: Long, lang: String, tokens: Long,
                            pack_id: Long)

/** Sequence packing for training: concatenate documents into fixed
  * token-budget packs (context windows) with minimal padding waste.
  *
  * Semantics: greedy sequential first-fit in doc_id order WITHIN each
  * group (here: language) — the standard deterministic packing used by
  * training-data pipelines, where reproducibility beats the marginal
  * fill-rate of bin-packing heuristics. A document larger than the budget
  * occupies a pack alone (truncation is the trainer's decision, not the
  * packer's).
  *
  * Plan shape: hash-repartition by group, sort within partitions, then ONE
  * streaming pass per partition (`mapPartitions` with O(1) state — current
  * group, running total, pack counter). Nothing is buffered, so partition
  * size is unbounded; the sequential dependency is per GROUP, which is the
  * operator's inherent limit. At 100 TB the group key becomes (lang,
  * shard) with shard = a deterministic hash bucket of doc_id — same
  * operator, bounded sequential chains, pack ids scoped per shard.
  */
object Packing {

  def packDocuments(docs: DataFrame, budget: Long,
                    groupCol: String = "lang"): Dataset[PackAssign] = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
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
        checked(size(TextAnalysis.tokens(col("text"))).cast("long"),
          "text", "long").as("tokens"))
      .repartition(col("lang"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        // groups are contiguous after the sort; a group never spans
        // partitions because the repartition hashes on the group key
        var curLang: String = null
        var acc = 0L
        var pack = 0L
        it.map { case (id, lang, t) =>
          if (lang != curLang) { curLang = lang; pack = 1L; acc = t }
          else if (acc + t > budget) { pack += 1L; acc = t }
          else acc += t
          PackAssign(id, lang, t, pack)
        }
      }
  }
}
