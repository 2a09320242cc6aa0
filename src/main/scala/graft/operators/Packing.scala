package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Context-length packing: assign documents to fixed-token-budget bins
  * (the training-data step that concatenates documents into model context
  * windows). Exact greedy packing is inherently sequential; the
  * distributed formulation is deterministic-order running-sum binning:
  * documents in a stable order (by id), bin = floor(cumulative tokens
  * BEFORE this doc / budget) — every worker computes the same assignment
  * from the same prefix sums, one window shuffle, no driver loop. A doc
  * larger than the budget still gets a bin (its own prefix range).
  *
  * Bins are per-`partitionCol` group (pack per language/source so a
  * context window never mixes strata) — which also bounds window-state
  * per key at scale.
  */
object Packing {

  def packByTokenBudget(df: DataFrame, idCol: String, textCol: String,
                        partitionCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(partitionCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(partitionCol),
        size(TextFunctions.bpeishTokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin", ((col("cum_tokens") - col("n_tokens")) / budget).cast("long"))
  }
}
