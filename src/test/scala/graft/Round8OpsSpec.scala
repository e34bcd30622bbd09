package graft

import org.apache.spark.sql.functions._

import graft.ops.TrainOps

/** Round-8 guards: bounds that used to live only in scaladoc prose. */
class Round8OpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("chunkSliding maxDocTokens bounds a book-length doc's explode") {
    // 5000-token "book": without the cap the explode would carry the full
    // token array into ceil((5000-64)/48)+1 = 104 chunk rows (~520k token
    // copies). With maxDocTokens=200 the doc is pre-truncated BEFORE the
    // explode, so exactly ceil((200-64)/48)+1 = 4 chunk rows exist and
    // each carries ≤200 tokens — the O(len²/stride) cliff cannot fire.
    val book = Seq((1L, (0 until 5000).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val capped = TrainOps.chunkSliding(book, "doc_id", "text",
      window = 64, stride = 48, maxDocTokens = 200)
    val rows = capped.orderBy("chunk_idx").collect()
    assert(rows.length === 4)
    // identical to chunking the pre-truncated text directly (the cap is a
    // slice, not a different chunking policy)
    val truncated = Seq((1L, (0 until 200).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ref = TrainOps.chunkSliding(truncated, "doc_id", "text",
      window = 64, stride = 48).orderBy("chunk_idx").collect()
    assert(rows.map(_.toSeq.toList).toList === ref.map(_.toSeq.toList).toList)
    // last chunk is the truncated tail: tokens [144, 200) = 56 tokens
    assert(rows.last.getAs[Long]("chunk_len") === 56L)
  }

  test("adaptiveNList pins the fixture geometry and grows ~ sqrt(n)/2") {
    import graft.ops.Similarity
    def corpusOf(n: Int) = spark.range(n)
      .select(col("id").as("vec_id"), array(lit(1.0f)).as("embedding"))
    assert(Similarity.adaptiveNList(corpusOf(500)) === 16)   // both oracle sfs
    assert(Similarity.adaptiveNList(corpusOf(1024)) === 16)  // 2x fixture headroom
    assert(Similarity.adaptiveNList(corpusOf(2000)) === 23)  // sf0.1 probes
    assert(Similarity.adaptiveNList(corpusOf(20000)) === 71) // sf1x probe
    // occupancy subsplit: OFF at both oracle scales (occ ~31 < 64), on
    // exactly when expected occupancy crosses the 64 budget
    assert(Similarity.adaptiveGeometry(corpusOf(500)) === ((16, 0)))
    assert(Similarity.adaptiveGeometry(corpusOf(1024)) === ((16, 0)))
    assert(Similarity.adaptiveGeometry(corpusOf(2000)) === ((23, 1)))
    assert(Similarity.adaptiveGeometry(corpusOf(20000)) === ((71, 3)))
    // at fixture scale the adaptive default is bit-identical to the pinned
    // 16-cell geometry the static DuckDB oracles encode
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val auto = Similarity.cellEdges(emb, threshold = 0.3)
      .orderBy("id_a", "id_b").collect().toSeq
    val pinned = Similarity.cellEdges(emb, threshold = 0.3, nList = 16)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(auto === pinned)
  }

  test("NearestCell loop kernel matches the least-over-structs column form bit-for-bit") {
    import org.apache.spark.sql.functions.{least, lit, struct, typedlit}
    import graft.ops.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    for (k <- Seq(16, 71)) {
      val centers = Array.tabulate(k)(Similarity.fixedCentroid(_, 64))
      // the retired column formulation, rebuilt here as the referee
      val cands = centers.zipWithIndex.map { case (ctr, cid) =>
        struct((graft.functions.DotProduct.dot(col("v"), col("v"))
          - lit(2.0) * graft.functions.DotProduct.dot(col("v"), typedlit(ctr))
          + lit(ctr.map(x => x * x).sum)).as("dist2"), lit(cid).as("cid"))
      }
      val both = emb.select(col("vec_id"),
        graft.functions.NearestCell.of(col("v"), centers).as("fast"),
        least(cands: _*).getField("cid").as("ref"))
      assert(both.filter(col("fast") =!= col("ref")).count() === 0L, s"k=$k")
    }
  }

  test("occupancy subsplit keeps precision 1.0, emits each pair once, recall holds") {
    import graft.ops.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val flat = Similarity.cellEdgesGeom(emb, threshold = 0.3, k = 16, j = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val split = Similarity.cellEdgesGeom(emb, threshold = 0.3, k = 16, j = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    // exactly-once: x's j+1 probe keys are distinct, so at most one can
    // equal bits(y); the symmetric match is cut by id_a < id_b
    assert(split.size === split.toSet.size)
    // precision 1.0: candidates still pass the exact-cosine verify
    assert(split.toSet.subsetOf(flat))
    // recall model: 1-flip multiprobe keeps P = p^2 + 2p(1-p) per pair,
    // p = 1 - arccos(cos)/pi >= .597 at the .3 threshold => P >= .78 in
    // expectation; assert a loose floor (the fixture is finite)
    assert(flat.nonEmpty && split.size.toDouble / flat.size >= 0.6)
  }

  test("chunkSliding default cap is a no-op at normal doc lengths") {
    val doc = Seq((7L, (0 until 300).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val a = TrainOps.chunkSliding(doc, "doc_id", "text").orderBy("chunk_idx")
      .collect().map(_.toSeq.toList).toList
    val b = TrainOps.chunkSliding(doc, "doc_id", "text",
        maxDocTokens = 1 << 20).orderBy("chunk_idx")
      .collect().map(_.toSeq.toList).toList
    assert(a === b)
  }
}
