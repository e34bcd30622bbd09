package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi (min-surprisal) word segmentation against a scored piece
  * vocabulary — the ENCODE side of a unigram language-model tokenizer
  * (Kudo 2018, "Subword regularization"; the SentencePiece unigram
  * family), the tokenizer lineage complementing the BPE tier
  * ([[graft.ops.TrainOps]] bpeEncode / bpeMerges).
  *
  * DP over prefix lengths: `dp[i] = min over j in 1..maxPieceLen of
  * dp[i−j] + s(word[i−j..i])`, where `s` is the piece's integer
  * micro-bit surprisal. DETERMINISTIC tie-break, mirrored exactly by the
  * oracle's `row_number() OVER (ORDER BY score ASC, j DESC)`: equal
  * total surprisal prefers the LONGER last piece. A character absent
  * from the vocabulary costs [[ViterbiSeg.UnkPenaltyMicro]] as its own
  * piece (larger than any real surprisal, so it never wins a tie) —
  * corpus-fit vocabularies include every single character by
  * construction, making the fallback unreachable in the declared query.
  *
  * Cost: O(len · maxPieceLen) hash probes per word, evaluated on the
  * DISTINCT-word table only (Zipf-bounded), never per token.
  */
case class ViterbiSeg(child: Expression, vocab: Seq[(String, Long)],
                      maxPieceLen: Int) extends UnaryExpression {
  require(vocab.nonEmpty, "graft_viterbi_seg: empty vocabulary")
  require(maxPieceLen >= 1 && maxPieceLen <= 16,
    s"graft_viterbi_seg: maxPieceLen out of range: $maxPieceLen")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_viterbi_seg"

  @transient private lazy val lookup: java.util.HashMap[String, java.lang.Long] = {
    val h = new java.util.HashMap[String, java.lang.Long]()
    vocab.foreach { case (p, s) => h.put(p, s) }
    h
  }

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(ViterbiSeg.segment(
      input.asInstanceOf[UTF8String].toString, lookup, maxPieceLen))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ViterbiSeg.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val vocabRef = ctx.addReferenceObj("viterbiVocab", lookup, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  $cls.segment($s.toString(), $vocabRef, $maxPieceLen));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ViterbiSeg =
    copy(child = newChild)
}

object ViterbiSeg {

  /** Out-of-vocabulary single-character piece cost: far above any real
    * micro-bit surprisal (a corpus of 2^60 pieces still scores < 6·10^7),
    * so an UNK never ties a real segmentation. */
  val UnkPenaltyMicro = 1000000000L

  /** The DP. Returns pieces joined by '|'; empty word → empty string. */
  def segment(word: String, vocab: java.util.HashMap[String, java.lang.Long],
              maxPieceLen: Int): String = {
    val n = word.length
    if (n == 0) return ""
    val dp = new Array[Long](n + 1)
    val choice = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MaxValue
      var bestJ = 0
      var j = 1
      val jMax = math.min(maxPieceLen, i)
      while (j <= jMax) {
        val s = vocab.get(word.substring(i - j, i))
        val cost =
          if (s != null) s.longValue()
          else if (j == 1) UnkPenaltyMicro
          else Long.MaxValue
        if (cost != Long.MaxValue && dp(i - j) != Long.MaxValue) {
          val cand = dp(i - j) + cost
          // tie → longer last piece (j DESC), mirrored by the oracle
          if (cand < best || (cand == best && j > bestJ)) { best = cand; bestJ = j }
        }
        j += 1
      }
      dp(i) = best
      choice(i) = bestJ
      i += 1
    }
    val sb = new java.lang.StringBuilder(n + 8)
    def emit(k: Int): Unit = if (k > 0) {
      emit(k - choice(k))
      if (sb.length > 0) sb.append('|')
      sb.append(word, k - choice(k), k)
    }
    emit(n)
    sb.toString
  }

  val FunctionName = "graft_viterbi_seg"

  /** Vocab travels as one foldable literal: `piece:scoreMicro` pairs
    * comma-joined (pieces are token characters — no ':' or ','). */
  val builder: Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
        s"$FunctionName(word, vocab_spec, max_piece_len): literals required")
      val vocab = exprs(1).eval().toString.split(',').toSeq.filter(_.nonEmpty)
        .map { kv =>
          val i = kv.lastIndexOf(':')
          (kv.substring(0, i), kv.substring(i + 1).toLong)
        }
      ViterbiSeg(exprs.head, vocab, exprs(2).eval().toString.toInt)
    }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "scala_udf")

  /** Column API. `vocab` pairs are (piece, surprisalMicro). */
  def of(word: Column, vocab: Seq[(String, Long)], maxPieceLen: Int): Column = {
    require(vocab.forall { case (p, _) => !p.contains(',') && !p.contains(':') },
      "pieces must not contain ',' or ':'")
    register(SparkSession.active)
    call_function(FunctionName, word,
      lit(vocab.map { case (p, s) => s"$p:$s" }.mkString(",")),
      lit(maxPieceLen))
  }
}
