package graft

import org.apache.spark.sql.functions._

import graft.ops.CleanOps
import graft.sources.Tables

class CleanOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("tokenSegments chunks into non-overlapping <=n-token segments that rebuild the text") {
    val df = Seq((1L, "a b c d e f g h i j"), (2L, "solo"), (3L, "")).toDF("id", "text")
    val got = df.select(col("id"), CleanOps.tokenSegments(col("text"), 3).as("segs"))
      .orderBy("id").collect().map(_.getSeq[String](1).toList)
    assert(got(0) === List("a b c", "d e f", "g h i", "j"))
    assert(got(1) === List("solo"))
    assert(got(2) === List())
    // segments concatenated with the separator reconstruct the normalized text
    assert(got(0).mkString(" ") === "a b c d e f g h i j")
  }

  test("segmentDedup keeps first corpus-wide occurrence and rebuilds in order") {
    // doc 1: [x y, z w]; doc 2: [z w, u v] — "z w" survives only in doc 1
    val df = Seq((1L, "x y z w"), (2L, "z w u v")).toDF("doc_id", "text")
    val out = CleanOps.segmentDedup(df, "doc_id", CleanOps.tokenSegments(col("text"), 2))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_segs") === 2 && out(0).getAs[Long]("n_kept") === 2)
    assert(out(0).getAs[String]("kept_text") === "x y z w")
    assert(out(1).getAs[Long]("n_segs") === 2 && out(1).getAs[Long]("n_kept") === 1)
    assert(out(1).getAs[String]("kept_text") === "u v")
    assert(out(1).getAs[Double]("retained_frac") === 0.5)
  }

  test("segmentDedup keeps a within-doc repeated segment only at its first position") {
    val df = Seq((7L, "p q p q r s")).toDF("doc_id", "text")
    val out = CleanOps.segmentDedup(df, "doc_id", CleanOps.tokenSegments(col("text"), 2))
      .collect()
    assert(out(0).getAs[Long]("n_segs") === 3)
    assert(out(0).getAs[Long]("n_kept") === 2)
    assert(out(0).getAs[String]("kept_text") === "p q r s")
  }

  test("crossDocNgramDup scores shared n-grams and leaves unique docs at zero") {
    val df = Seq(
      (1L, "alpha beta gamma delta unique1 one"),
      (2L, "alpha beta gamma delta unique2 two"),
      (3L, "completely different tokens here again")).toDF("doc_id", "text")
    val out = CleanOps.crossDocNgramDup(df, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect()
    // docs 1/2 share exactly the gram alpha_beta_gamma_delta (3 grams each)
    assert(out(0).getAs[Long]("n_dup") === 1 && out(0).getAs[Long]("n_grams") === 3)
    assert(out(1).getAs[Long]("n_dup") === 1)
    assert(out(2).getAs[Long]("n_dup") === 0)
  }

  test("lmUnigramScore matches the hand-computed add-one unigram surprisal") {
    // corpus: a a a b -> c(a)=3, c(b)=1, T=4, V=2
    // p(a)=(3+1)/(4+2)=2/3, p(b)=(1+1)/6=1/3
    val df = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val out = CleanOps.lmUnigramScore(df, "doc_id", "text").collect()
    def micro(p: Double): Long =
      math.round(BigDecimal(-math.log(p) / math.log(2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    // integer micro-bit mean: (3*nll(a) + nll(b)) div 4, truncating
    val expected = ((micro(2.0 / 3) * 3 + micro(1.0 / 3)) / 4).toDouble / 1e6
    assert(out(0).getAs[Long]("n_tok") === 4)
    assert(math.abs(out(0).getAs[Double]("avg_nll") - expected) < 1e-12)
  }

  test("segmentDedup conservation laws hold on a randomized corpus") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val corpus = (1L to 40L).map(i =>
      (i, Seq.fill(rnd.nextInt(30) + 1)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val df = corpus.toDF("doc_id", "text")
    val segs = CleanOps.tokenSegments(col("text"), 3)
    val out = CleanOps.segmentDedup(df, "doc_id", segs).collect()
    val distinctSegs = df.select(explode(segs).as("s")).distinct().count()
    // conservation: every distinct segment survives exactly once
    assert(out.map(_.getAs[Long]("n_kept")).sum === distinctSegs)
    out.foreach { r =>
      val (nSegs, nKept) = (r.getAs[Long]("n_segs"), r.getAs[Long]("n_kept"))
      assert(nKept >= 0 && nKept <= nSegs)
      val frac = r.getAs[Double]("retained_frac")
      assert(frac >= 0.0 && frac <= 1.0)
      // rebuilt text token count equals 3x full segments + the remainder:
      // just check it never exceeds the original and parses back to tokens
      val keptToks = r.getAs[String]("kept_text").split(" ").filter(_.nonEmpty).length
      assert(keptToks <= nSegs * 3 && (nKept == 0 || keptToks > 0))
    }
    // every document is present in the output exactly once
    assert(out.map(_.getAs[Long]("doc_id")).toSet === (1L to 40L).toSet)
  }

  test("substringDedup cuts exactly the planted shared run, in every copy") {
    // two docs share one 80-char run embedded at different offsets; a third
    // is untouched. gram=64 => marked positions are the 17 openings of the
    // run, merging into ONE 80-char range per doc.
    val run = (0 until 80).map(i => ('a' + (i * 7 % 26)).toChar).mkString
    val a = "AAAA" + run + "BBBBBBBB"
    val b = "CCCCCCCCCCCC" + run + "D"
    val c = "totally unique content that is long enough to clear the gram " +
      "threshold but shares nothing with the others at all............."
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = CleanOps.substringDedup(df, "doc_id", "text", gram = 64)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("n_ranges") === 1)
    assert(out(0).getAs[Long]("dup_chars") === 80)
    assert(out(0).getAs[String]("clean_text") === "AAAA" + "BBBBBBBB")
    assert(out(1).getAs[Long]("n_ranges") === 1)
    assert(out(1).getAs[Long]("dup_chars") === 80)
    assert(out(1).getAs[String]("clean_text") === "CCCCCCCCCCCC" + "D")
    assert(out(2).getAs[Long]("n_ranges") === 0)
    assert(out(2).getAs[String]("clean_text") === c)
  }

  test("substringDedup invariants on the fixture corpus") {
    val docs = Tables.documents(spark, sf0001)
    val out = CleanOps.substringDedup(docs, "doc_id", "text", gram = 64)
    val rows = out.collect()
    val orig = docs.select(col("doc_id"), length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.length === orig.size) // every doc passes through
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val dup = r.getAs[Long]("dup_chars")
      val clean = r.getAs[String]("clean_text")
      // conservation: cleaned length + removed chars == original length
      assert(clean.length + dup === orig(id),
        s"doc $id: ${clean.length} + $dup != ${orig(id)}")
      assert(r.getAs[Long]("n_ranges") >= 0 && dup >= 0)
      // every merged range is at least one gram long
      assert(dup >= 64L * r.getAs[Long]("n_ranges"))
    }
    // the fixture's planted near-dups must actually trigger the operator
    assert(rows.count(_.getAs[Long]("n_ranges") > 0) > 0)
  }

  test("redactPii masks emails, IPs, and phones; counts match") {
    val df = Seq((1L, "write bob.smith+x@mail.example.org or ping 192.168.0.1 or call 555-0199 twice 555-0200"),
                 (2L, "nothing sensitive here")).toDF("id", "text")
    val out = df.select(col("id"),
        CleanOps.piiCount(col("text"), CleanOps.EmailRe).as("ne"),
        CleanOps.piiCount(col("text"), CleanOps.Ipv4Re).as("ni"),
        CleanOps.piiCount(col("text"), CleanOps.PhoneRe).as("np"),
        CleanOps.redactPii(col("text")).as("red"))
      .orderBy("id").collect()
    assert(out(0).getAs[Long]("ne") === 1 && out(0).getAs[Long]("ni") === 1 && out(0).getAs[Long]("np") === 2)
    assert(out(0).getAs[String]("red") ===
      "write <EMAIL> or ping <IP> or call <PHONE> twice <PHONE>")
    assert(out(1).getAs[String]("red") === "nothing sensitive here")
  }
  test("sourceOverlap counts shared distinct shingles and Jaccard per source pair") {
    val d = Seq(
      (1L, "sa", "a b c d"),          // shingles: a_b_c, b_c_d
      (2L, "sa", "a b c e"),          // a_b_c, b_c_e  -> sa: {a_b_c, b_c_d, b_c_e}
      (3L, "sb", "a b c d"),          // sb: {a_b_c, b_c_d}
      (4L, "sc", "x y z w")           // sc: {x_y_z, y_z_w} disjoint
    ).toDF("doc_id", "source", "text")
    val got = CleanOps.sourceOverlap(d, "source", "text", n = 3, maxSrc = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // sa∩sb = {a_b_c, b_c_d} -> 2/(3+2-2)=2/3 -> 666666 micro (truncating)
    assert(got === Map(("sa", "sb") -> ((3L, 2L, 2L, 666666L))))
  }

  test("canonicalizeUrl normalizes every decoration and keeps content params") {
    val cases = Seq(
      // fragment, tracking params, default port, case, trailing slash
      ("HTTPS://Src1.Example.COM:443/en/p3/?utm_source=feed&id=2&ref=1#sec",
       "https://src1.example.com/en/p3?id=2"),
      // tracking param last, no port, no fragment
      ("https://a.example.com/x?id=1&utm_campaign=z", "https://a.example.com/x?id=1"),
      // only tracking params -> query dropped entirely
      ("http://A.example.com/x/?ref=7", "http://a.example.com/x"),
      // :8443 is NOT the https default port and must survive
      ("https://h.example.com:8443/p", "https://h.example.com:8443/p"),
      // path case is preserved (only scheme/host are case-insensitive)
      ("https://H.example.com/CaseSensitivePath", "https://h.example.com/CaseSensitivePath"))
    val got = cases.zipWithIndex.map { case ((u, _), i) => (i, u) }
      .toDF("i", "url")
      .select(col("i"), CleanOps.canonicalizeUrl(col("url")).as("c"))
      .orderBy("i").collect().map(_.getString(1)).toSeq
    assert(got === cases.map(_._2))
  }

  test("c4Filter line rules: terminal punct, min words, javascript screen") {
    val df = Seq(
      (1L, Array(
        "one two three four five.",    // kept
        "one two three four five",     // no terminal punct
        "too short.",                  // < 5 words
        "one two three javascript x.", // javascript mention
        "does it end in a question?",  // kept: '?' terminal
        "he said \"quoted words end fine\"")) // kept: '"' terminal
    ).toDF("doc_id", "lines")
    val out = CleanOps.c4Filter(df, "doc_id", col("lines")).collect()(0)
    assert(out.getAs[Long]("n_lines") === 6L)
    assert(out.getAs[Long]("n_kept") === 3L)
    assert(out.getAs[String]("cleaned_text") ===
      "one two three four five.\ndoes it end in a question?\nhe said \"quoted words end fine\"")
    assert(out.getAs[Boolean]("keep"))
  }

  test("c4Filter page rules: brace, lorem ipsum, min kept lines; empty rebuild") {
    val ok = Array("alpha beta gamma delta one.", "alpha beta gamma delta two.",
      "alpha beta gamma delta three.")
    val df = Seq(
      (1L, ok),                                                  // keep
      (2L, ok :+ "int f() { return 0; }"),                       // brace -> drop
      (3L, ok :+ "Lorem Ipsum dolor sit amet filler text here."),// lorem -> drop
      (4L, ok.take(2)),                                          // < 3 kept -> drop
      (5L, Array("no terminal punct at all"))                    // nothing kept
    ).toDF("doc_id", "lines")
    val out = CleanOps.c4Filter(df, "doc_id", col("lines"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Boolean]("keep")).toSeq ===
      Seq(true, false, false, false, false))
    assert(out(1).getAs[Boolean]("has_brace") && !out(1).getAs[Boolean]("has_lorem"))
    assert(out(2).getAs[Boolean]("has_lorem"))
    assert(out(4).getAs[Long]("n_kept") === 0L)
    assert(out(4).getAs[String]("cleaned_text") === "") // empty, not null
  }
}
