package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes over token counts — the
  * train-a-classifier-on-the-corpus step of an LLM data pipeline (the
  * GPT-3/LLaMA "quality classifier" and fastText lang-id shape: fit a
  * cheap linear model on labeled docs, score the whole corpus with it).
  *
  * Training is ONE partially-aggregable pass: per-term conditional label
  * counts (labels are call-site literals, so the dense count columns
  * aggregate map-side — no label cross join), with the per-label token
  * totals and vocabulary size folded in by an unpartitioned window over
  * the VOCAB-sized count table (the dsirWeights pattern — bounded state;
  * at open-web scale cap the vocabulary by document frequency first, as
  * production classifiers do). Scoring joins test tokens against the
  * BROADCAST long-form model on the term — every stage an equi-join, no
  * constant-key product anywhere.
  *
  * Determinism (the repo-wide integer contract): the only transcendental,
  * `ln`, is rounded to integer micro-units per model cell — add-one
  * likelihood ln((c+1)/(T_l+V)) and doc-frequency prior ln(n_l/N) — so
  * every per-doc score is an exact BIGINT sum and the argmax (score desc,
  * label-index asc) is a total order both engines compute bit-for-bit.
  *
  * Out-of-vocabulary test tokens are skipped (the inner model join drops
  * them — standard NB practice); a test document with NO in-vocabulary
  * token is absent from the output.
  */
object Classify {

  /** Per-document label prediction: (id, pred, actual, correct) for every
    * test document with ≥ 1 in-vocabulary token.
    *
    * @param labels the label alphabet as literals, SORTED ascending (ties
    *               in the argmax resolve to the smallest label)
    * @param isTest test-split predicate; the complement trains */
  def naiveBayesPredict(docs: DataFrame, idCol: String, textCol: String,
                        labelCol: String, labels: Seq[String],
                        isTest: Column): DataFrame = {
    require(labels == labels.sorted && labels.distinct == labels,
      "labels must be sorted and distinct (the argmax tie-break depends on it)")
    val toks = docs.select(col(idCol), col(labelCol), isTest.as("is_test"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val train = toks.filter(!col("is_test"))

    // dense per-term label counts; totals/vocab via the bounded window
    val cCols = labels.map(l =>
      sum(when(col(labelCol) === l, 1L).otherwise(0L)).as(s"c_$l"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val counts = train.groupBy("term").agg(cCols.head, cCols.tail: _*)
    val withTotals = labels.foldLeft(counts.withColumn("v", count(lit(1)).over(wAll))) {
      (df, l) => df.withColumn(s"t_$l", sum(col(s"c_$l")).over(wAll))
    }
    // long-form model cells (term, lidx, ll_micro)
    val cells = labels.zipWithIndex.map { case (l, i) =>
      struct(lit(i.toLong).as("lidx"),
        round(log((col(s"c_$l") + lit(1.0)) / (col(s"t_$l") + col("v")).cast("double"))
          * lit(1e6), 0).cast("long").as("ll"))
    }
    val model = withTotals.select(col("term"), explode(array(cells: _*)).as("e"))
      .select(col("term"), col("e.lidx").as("lidx"), col("e.ll").as("ll"))

    // doc-frequency priors: 5 rows, keyed by label index for the equi-join
    val lidxOf = labels.zipWithIndex.foldLeft(lit(-1L)) { case (acc, (l, i)) =>
      when(col(labelCol) === l, lit(i.toLong)).otherwise(acc)
    }
    val priors = docs.filter(!isTest)
      .select(lidxOf.as("lidx"))
      .groupBy("lidx").agg(count(lit(1)).as("n_l"))
      .withColumn("n_all", sum(col("n_l")).over(wAll))
      .select(col("lidx"),
        round(log(col("n_l").cast("double") / col("n_all")) * lit(1e6), 0)
          .cast("long").as("prior"))
    val m = model.join(broadcast(priors), "lidx")

    // score test tokens against the broadcast model; argmax per doc
    val labArr = array(labels.map(lit): _*)
    val scored = toks.filter(col("is_test"))
      .select(col(idCol), col(labelCol), col("term"))
      .join(broadcast(m), "term")
      .groupBy(col(idCol), col(labelCol), col("lidx"))
      .agg((sum(col("ll")) + min(col("prior"))).as("score"))
      .groupBy(col(idCol), col(labelCol))
      .agg(max(struct(col("score"), (-col("lidx")).as("negl"))).as("b"))
    scored.select(col(idCol),
        element_at(labArr, (-col("b.negl")).cast("int") + 1).as("pred"),
        col(labelCol).as("actual"))
      .withColumn("correct", col("pred") === col("actual"))
  }
}
