package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColumnMapping, RubyStrftime, TagPattern}

/** ScalaCheck properties for the pure pipeline-core pieces (SURVEY §7
  * phase 0): the Fluentd match-pattern compiler, the column-mapping
  * parser, and the Ruby-strftime translator.
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val tagPart: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private val tag: Gen[String] = for {
    n <- Gen.choose(1, 4)
    ps <- Gen.listOfN(n, tagPart)
  } yield ps.mkString(".")

  test("a literal tag pattern matches itself and nothing with other parts") {
    check(Prop.forAll(tag) { t =>
      TagPattern(t).matches(t) && !TagPattern(t).matches(t + ".extra") &&
        !TagPattern(t).matches("pre." + t)
    })
  }

  test("per-part * never crosses a dot; ** matches any suffix") {
    check(Prop.forAll(tag, tagPart) { (t, extra) =>
      val parts = t.split("\\.")
      val starred = ("*" +: parts.tail).mkString(".")
      val p = TagPattern(starred)
      val starOk = p.matches((extra +: parts.tail).mkString("."))
      val noCross = !p.matches(((extra + "." + extra) +: parts.tail).mkString("."))
      val doubleStar = TagPattern(parts.head + ".**")
      val suffixOk = doubleStar.matches(t) &&
        doubleStar.matches(parts.head + "." + extra) &&
        doubleStar.matches(parts.head)
      starOk && noCross && suffixOk
    })
  }

  test("{a,b} alternation matches exactly the union of its expansions") {
    check(Prop.forAll(tag, tag, tag) { (a, b, other) =>
      val p = TagPattern(s"{$a,$b}")
      p.matches(a) && p.matches(b) &&
        (p.matches(other) == (other == a || other == b))
    })
  }

  test("first-match routing: earlier patterns win; no match falls to default") {
    check(Prop.forAll(tag, tag) { (a, b) =>
      val routes = Seq(TagPattern(a) -> "first", TagPattern("**") -> "catchall")
      val route = TagPattern.route(routes, "default") _
      route(a) == "first" && (a == b || route(b) == "catchall")
    })
  }

  private val colName: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  test("column-mapping parse: from:to pairs and identity shorthand round-trip") {
    val entry: Gen[(String, String, Boolean)] = for {
      f <- colName; t <- colName; identity <- Gen.oneOf(true, false)
    } yield (f, t, identity)
    check(Prop.forAll(Gen.nonEmptyListOf(entry)) { entries =>
      val spec = entries.map { case (f, t, id) => if (id) f else s"$f:$t" }.mkString(",")
      val parsed = ColumnMapping.parse(spec).pairs
      parsed == entries.map { case (f, t, id) => if (id) (f, f) else (f, t) }
    })
  }

  test("parse ignores empty segments and surrounding whitespace") {
    check(Prop.forAll(colName, colName) { (f, t) =>
      ColumnMapping.parse(s" $f : $t ,, ").pairs == Seq((f, t)) &&
        ColumnMapping.parse(s",$f,").pairs == Seq((f, f))
    })
  }

  test("KMV sketch laws: any reduce/merge split yields the true bottom-k") {
    val agg = new graft.ops.Sketch.KmvAgg(8)
    val hashes: Gen[List[Long]] =
      Gen.listOf(Gen.choose(0L, 1L << 60)) // duplicates likely on small ranges
    val split: Gen[(List[Long], Int)] = for {
      hs <- hashes
      cut <- Gen.choose(0, math.max(0, hs.length))
    } yield (hs, cut)
    check(Prop.forAll(split) { case (hs, cut) =>
      val (l, r) = hs.splitAt(cut)
      val viaSketch = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val truth = hs.distinct.sorted.take(8)
      viaSketch == truth &&
        agg.merge(r.foldLeft(agg.zero)(agg.reduce),
          l.foldLeft(agg.zero)(agg.reduce)) == truth // commutative
    })
  }

  test("top-k aggregate laws: any split/merge/serde yields the true smallest k") {
    import scala.collection.mutable.ArrayBuffer
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val k = 5
    val agg = graft.functions.TopKPairs(Literal(0L), Literal(0L), k)
    def decode(v: Any): List[(Long, Long)] =
      v.asInstanceOf[GenericArrayData].array.toList
        .map(r => (r.asInstanceOf[InternalRow].getLong(0),
          r.asInstanceOf[InternalRow].getLong(1)))
    def buf(ps: List[(Long, Long)]): ArrayBuffer[Long] = {
      val b = agg.createAggregationBuffer()
      ps.foreach { p => b += p._1 += p._2 }
      b
    }
    val pairs: Gen[List[(Long, Long)]] = Gen.listOf(Gen.choose(-1000L, 1000L))
      .map(_.zipWithIndex.map { case (o, i) => (o, i.toLong) }) // unique ids
    val split: Gen[(List[(Long, Long)], Int)] = for {
      ps <- pairs
      cut <- Gen.choose(0, math.max(0, ps.length))
    } yield (ps, cut)
    check(Prop.forAll(split) { case (ps, cut) =>
      val truth = ps.sorted.take(k)
      val (l, r) = ps.splitAt(cut)
      val merged = agg.merge(buf(l), buf(r))
      val viaSerde = agg.deserialize(agg.serialize(agg.merge(buf(r), buf(l))))
      decode(agg.eval(merged)) == truth && decode(agg.eval(viaSerde)) == truth
    })
  }

  test("Gram aggregator law: any split/merge equals the single-pass buffer") {
    val dim = 3
    val agg = new graft.ops.Pca.GramAgg(dim)
    val vecs: Gen[List[List[Double]]] = Gen.listOf(
      Gen.listOfN(dim, Gen.choose(-100, 100).map(_.toDouble)))
    val split: Gen[(List[List[Double]], Int)] = for {
      vs <- vecs
      cut <- Gen.choose(0, math.max(0, vs.length))
    } yield (vs, cut)
    check(Prop.forAll(split) { case (vs, cut) =>
      val whole = vs.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val (l, r) = vs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)((b, v) => agg.reduce(b, v)),
        r.foldLeft(agg.zero)((b, v) => agg.reduce(b, v)))
      merged.toSeq == whole.toSeq
    })
  }

  test("strftime translation: literal runs survive, %-directives all translate") {
    // every directive the reference can reach via time_format configs
    val directives = Seq("%Y", "%m", "%d", "%H", "%M", "%S", "%N", "%3N", "%6N", "%9N",
      "%z", "%:z", "%L", "%j", "%y", "%%")
    val ok = directives.forall { d =>
      val java = RubyStrftime.toSparkPattern(s"x $d y")
      java.nonEmpty && !java.contains("%" + d.drop(1)) // nothing left untranslated
    }
    assert(ok)
  }
}
