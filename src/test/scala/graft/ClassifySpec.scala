package graft

import org.apache.spark.sql.functions._

import graft.ops.Classify

class ClassifySpec extends SparkSpecBase {
  import spark.implicits._

  // vocab-separable two-class corpus: label "a" docs speak apples, "b" docs
  // speak bolts; test docs (id % 3 == 0) must classify perfectly
  private def corpus = (0L until 30L).map { i =>
    val lab = if (i % 2 == 0) "a" else "b"
    val text = if (lab == "a") s"apple orchard cider pie core seed x$i"
               else s"bolt wrench socket thread torque nut x$i"
    (i, text, lab)
  }.toDF("doc_id", "text", "lang")

  test("NB learns a vocab-separable corpus perfectly; partitioning-invariant") {
    val out = Classify.naiveBayesPredict(corpus, "doc_id", "text", "lang",
        labels = Seq("a", "b"), isTest = col("doc_id") % 3 === 0)
      .orderBy("doc_id").collect()
    assert(out.length === 10)
    assert(out.forall(_.getAs[Boolean]("correct")))
    val reparted = Classify.naiveBayesPredict(corpus.repartition(7),
        "doc_id", "text", "lang",
        labels = Seq("a", "b"), isTest = col("doc_id") % 3 === 0)
      .orderBy("doc_id").collect()
    assert(out.map(_.toString).toSeq === reparted.map(_.toString).toSeq)
  }

  test("argmax ties resolve to the smallest label and OOV-only docs drop") {
    // doc 0 is the test doc; its only token "zz" is out-of-vocabulary
    // (never in train) -> no output row. doc 3's token appears equally in
    // both classes with equal priors -> tie -> label "a".
    val d = Seq(
      (0L, "zz", "a"),
      (3L, "shared", "b"),
      (1L, "shared alpha", "a"), (5L, "shared alpha", "a"),
      (2L, "shared beta", "b"), (4L, "shared beta", "b"))
      .toDF("doc_id", "text", "lang")
    val out = Classify.naiveBayesPredict(d, "doc_id", "text", "lang",
        labels = Seq("a", "b"), isTest = col("doc_id") === 0L || col("doc_id") === 3L)
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("doc_id") === 3L && out(0).getAs[String]("pred") === "a")
  }
}
