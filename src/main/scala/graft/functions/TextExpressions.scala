package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels for the Gopher-quality hot path.
  *
  * The built-in route computed, PER DOCUMENT and PER n ∈ {2,3,4}:
  * `sort_array(transform(sequence(...), concat_ws(...)))` followed by an
  * `aggregate` run-length fold — every one of those higher-order
  * functions evaluates through the interpreted HOF machinery (lambda
  * variables bound per element, a struct state allocated per step), and
  * the three n-gram pipelines dominated the operator's single map job
  * (measured at sf0.1: ~1.4 s of a 1.7 s scan). The kernels below run
  * the same algorithm as plain JVM loops invoked from whole-stage
  * codegen — the [[SortedLongIntersectCount]] precedent: the map-only
  * plan shape is untouched, only the per-task expression cost changes.
  * Ordering note: `java.util.Arrays.sort` over UTF8String uses its
  * binary `compareTo`, the SAME ordering `sort_array` applies to
  * default-collation strings, so the run-length walk sees the grams in
  * the exact order the fold did (equivalence spec-pinned).
  */
object TextKernels {
  private val Space = UTF8String.fromString(" ")

  /** Longest run (count, gram) over the ASCENDING-sorted word n-grams of
    * `toks` — semantics of the former sort+fold chain exactly: grams are
    * `concat_ws(" ", toks[i..i+n-1])` (null elements skipped, matching
    * concat_ws), ties on the run length resolve to the FIRST = smallest
    * gram (strict `>`), and a document with fewer than `n` tokens yields
    * (0, "").
    */
  def topNgram(toks: ArrayData, n: Int): InternalRow = {
    val sz = toks.numElements()
    val k = sz - n + 1
    if (k <= 0)
      return new GenericInternalRow(
        Array[Any](0L, UTF8String.EMPTY_UTF8))
    val grams = new Array[AnyRef](k)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < k) {
      var j = 0
      while (j < n) {
        parts(j) = if (toks.isNullAt(i + j)) null
          else toks.getUTF8String(i + j)
        j += 1
      }
      grams(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    java.util.Arrays.sort(grams)
    var best = 0L
    var bestg: UTF8String = UTF8String.EMPTY_UTF8
    var run = 0L
    var prev: UTF8String = null
    i = 0
    while (i < k) {
      val g = grams(i).asInstanceOf[UTF8String]
      run = if (prev != null && g.equals(prev)) run + 1 else 1L
      if (run > best) { best = run; bestg = g }
      prev = g
      i += 1
    }
    new GenericInternalRow(Array[Any](best, bestg))
  }

  /** Whitespace tokenization as ONE byte scan — the semantics of
    * `filter(split(trim(text), "\\s+"), t => t =!= "")` exactly: Java
    * regex `\s` is the six ASCII bytes {0x09..0x0D, 0x20}, none of which
    * can occur inside a multi-byte UTF-8 sequence (continuation bytes
    * are ≥ 0x80), so the maximal runs of non-`\s` BYTES are precisely
    * the non-empty tokens the regex split + empty-filter produced (the
    * trim only ever removed tokens that were already empty). No regex,
    * no HOF machinery, at most one byte-copy per row (`getBytes` copies
    * only when the string does not span its buffer; token slices share
    * the copy).
    */
  def wsTokens(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == 0x20 || (c >= 0x09 && c <= 0x0d)) i += 1
      else {
        val start = i
        var j = i + 1
        while (j < n && {
          val d = b(j); !(d == 0x20 || (d >= 0x09 && d <= 0x0d))
        }) j += 1
        out.add(UTF8String.fromBytes(b, start, j - start))
        i = j
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  /** Σ length(t) over the token array — `aggregate(toks, 0L, acc +
    * length(t))` semantics exactly: char counts (UTF8String.numChars),
    * NULL on a null element (the fold's null-propagation; never a
    * partial sum — the DotProduct rule).
    */
  def tokenLenSum(toks: ArrayData): java.lang.Long = {
    val sz = toks.numElements()
    var acc = 0L
    var i = 0
    while (i < sz) {
      if (toks.isNullAt(i)) return null
      acc += toks.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** (n_chunks, n_distinct) over the `chunkTokens`-token chunk strings of
    * a NON-EMPTY token array — the former
    * `transform(chunkStructs(toks, ct), _.chunk)` + `array_distinct`
    * pipeline's counts exactly: chunk i joins toks[i·ct .. i·ct+ct−1]
    * (null elements skipped, concat_ws semantics), i ranges over
    * 0..floor((|toks|−1)/ct). Callers guard the empty array (the
    * operator's when(size = 0) arm).
    */
  def dupChunkStats(toks: ArrayData, chunkTokens: Int): InternalRow = {
    val sz = toks.numElements()
    val nChunks = if (sz == 0) 1 else (sz - 1) / chunkTokens + 1
    val seen = new java.util.HashSet[UTF8String](nChunks * 2)
    var c = 0
    while (c < nChunks) {
      val from = c * chunkTokens
      val until = math.min(from + chunkTokens, sz)
      val parts = new Array[UTF8String](until - from)
      var j = from
      while (j < until) {
        parts(j - from) = if (toks.isNullAt(j)) null
          else toks.getUTF8String(j)
        j += 1
      }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      c += 1
    }
    new GenericInternalRow(Array[Any](nChunks, seen.size()))
  }

  /** Count of DISTINCT `words` present in `toks` case-insensitively —
    * `Σ when(array_contains(transform(toks, lower), w), 1)` semantics:
    * null elements never match, each word counts once however often it
    * appears. Early-exits once every word was seen (result-identical).
    */
  def stopwordHits(toks: ArrayData, words: Array[UTF8String]): Int = {
    val all = (1 << words.length) - 1
    var mask = 0
    val sz = toks.numElements()
    var i = 0
    while (i < sz && mask != all) {
      if (!toks.isNullAt(i)) {
        val tl = toks.getUTF8String(i).toLowerCase
        var w = 0
        while (w < words.length) {
          if ((mask & (1 << w)) == 0 && tl.equals(words(w))) mask |= 1 << w
          w += 1
        }
      }
      i += 1
    }
    Integer.bitCount(mask)
  }
}

/** struct(best BIGINT, bestg STRING): the longest-run n-gram of a token
  * array (see [[TextKernels.topNgram]]). NULL input → NULL (the callers
  * guarantee non-null token arrays via wsTokens' null ≡ empty contract).
  */
case class TopNgram(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"TopNgram n=$n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"top_ngram requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("best", LongType, nullable = false),
    StructField("bestg", StringType, nullable = false)))

  override def prettyName: String = "top_ngram"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.topNgram(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.topNgram($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TopNgram =
    copy(child = newChild)
}

/** array<string> of whitespace tokens (see [[TextKernels.wsTokens]]) —
  * containsNull = false by construction (every element is a non-empty
  * byte run). NULL input → NULL; the public wsTokens Column wraps the
  * null ≡ empty coalesce exactly as the split form did.
  */
case class WsTokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ws_tokens requires string, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "ws_tokens"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.wsTokens(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wsTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokens =
    copy(child = newChild)
}

/** BIGINT Σ char-length over a token array (see
  * [[TextKernels.tokenLenSum]]). NULL input or element → NULL.
  */
case class TokenLenSum(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_len_sum requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  // NULL on a null ELEMENT even when the input column itself is
  // non-nullable — without this override nullSafeCodeGen receives a
  // FalseLiteral isNull and the emitted `false = true;` fails Janino
  // compilation (the SortedLongIntersectCount lesson).
  override def nullable: Boolean = true

  override def prettyName: String = "token_len_sum"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.tokenLenSum(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("lenSum")
      s"""
         |java.lang.Long $boxed = graft.functions.TextKernels.tokenLenSum($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): TokenLenSum =
    copy(child = newChild)
}

/** struct(n_chunks INT, n_distinct INT) over a token array's chunk
  * strings (see [[TextKernels.dupChunkStats]]). NULL input → NULL.
  */
case class DupChunkStats(child: Expression, chunkTokens: Int)
    extends UnaryExpression {
  require(chunkTokens >= 1, s"chunkTokens=$chunkTokens must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dup_chunk_stats requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_chunks", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false)))

  override def prettyName: String = "dup_chunk_stats"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.dupChunkStats(a.asInstanceOf[ArrayData], chunkTokens)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.dupChunkStats($c, $chunkTokens)")

  override protected def withNewChildInternal(
      newChild: Expression): DupChunkStats =
    copy(child = newChild)
}

/** INT count of distinct `words` present in a token array, case-folded
  * (see [[TextKernels.stopwordHits]]). Bounded to 31 words by the bitmask
  * (the Gopher list is 9). NULL input → NULL.
  */
case class StopwordHits(child: Expression, words: Seq[String])
    extends UnaryExpression {
  require(words.nonEmpty && words.size <= 31,
    s"StopwordHits supports 1..31 words, got ${words.size}")

  @transient private lazy val utf8Words: Array[UTF8String] =
    words.map(UTF8String.fromString).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"stopword_hits requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "stopword_hits"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.stopwordHits(a.asInstanceOf[ArrayData], utf8Words)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("stopwords", utf8Words,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.stopwordHits($c, $wordsRef)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): StopwordHits =
    copy(child = newChild)
}

object TextFunctions {
  /** Codegen'd longest-run n-gram: struct(best, bestg). */
  def topNgram(toks: Column, n: Int): Column =
    GraftExpressionShim.column(TopNgram(
      GraftExpressionShim.expression(toks), n))

  /** Codegen'd distinct case-folded stopword count. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    GraftExpressionShim.column(StopwordHits(
      GraftExpressionShim.expression(toks), words))

  /** Codegen'd whitespace tokenizer (null-propagating; wrap the
    * null ≡ empty coalesce at the call site like the split form).
    */
  def wsTokensRaw(text: Column): Column =
    GraftExpressionShim.column(WsTokens(
      GraftExpressionShim.expression(text)))

  /** Codegen'd Σ char-length over a token array. */
  def tokenLenSum(toks: Column): Column =
    GraftExpressionShim.column(TokenLenSum(
      GraftExpressionShim.expression(toks)))

  /** Codegen'd chunk census: struct(n_chunks, n_distinct). */
  def dupChunkStats(toks: Column, chunkTokens: Int): Column =
    GraftExpressionShim.column(DupChunkStats(
      GraftExpressionShim.expression(toks), chunkTokens))
}
