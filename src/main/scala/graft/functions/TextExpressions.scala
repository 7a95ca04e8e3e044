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

  /** The word n-grams of a token array, in position order — the
    * `transform(sequence(1, |toks|−n+1), i => concat_ws(" ", toks[i..]))`
    * chain as one native loop (null elements skipped like concat_ws;
    * fewer than n tokens → empty array, the guard every call site
    * already applied via when()).
    */
  private[functions] def gramsOf(toks: ArrayData, n: Int): Array[AnyRef] = {
    val sz = toks.numElements()
    val k = sz - n + 1
    if (k <= 0) return Array.empty[AnyRef]
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
    grams
  }

  def ngramArray(toks: ArrayData, n: Int): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(gramsOf(toks, n))

  /** Distinct shingles — [[gramsOf]] + first-occurrence dedup +
    * the short-document fallbacks, exactly `Dedup.shinglesFromTokens`'
    * former expression: |toks| ≥ n → array_distinct(ngrams); 0 < |toks|
    * < n → [concat_ws(" ", toks)]; empty → [].
    */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val sz = toks.numElements()
    val out: Array[AnyRef] =
      if (sz == 0) Array.empty[AnyRef]
      else if (sz < n) {
        val parts = new Array[UTF8String](sz)
        var i = 0
        while (i < sz) {
          parts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
          i += 1
        }
        Array[AnyRef](UTF8String.concatWs(Space, parts: _*))
      } else {
        val grams = gramsOf(toks, n)
        // array_distinct keeps the FIRST occurrence of each value in
        // order — a LinkedHashSet replicates that exactly.
        val seen = new java.util.LinkedHashSet[AnyRef](grams.length * 2)
        var i = 0
        while (i < grams.length) { seen.add(grams(i)); i += 1 }
        seen.toArray(new Array[AnyRef](seen.size()))
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Winnowing fingerprints as ONE native pass — the former three-stage
    * HOF chain (gram build, per-gram
    * `conv(substring(md5(g), 1, 15), 16, 10)` 60-bit hash, sliding
    * window-`w` `array_distinct(array_min(slice))`) exactly: grams per
    * the winnow fallback (≥ k tokens → k-grams; 1..k−1 → whole text as
    * one gram; none → empty); hash = the md5 digest's first 15 hex
    * chars as a long (= top 60 bits); fingerprints = first-occurrence
    * distinct of each window's minimum (< w grams → the single global
    * min).
    */
  def winnowFingerprints(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val grams: Array[AnyRef] = {
      val sz = toks.numElements()
      if (sz == 0) Array.empty[AnyRef]
      else if (sz < k) {
        val parts = new Array[UTF8String](sz)
        var i = 0
        while (i < sz) {
          parts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
          i += 1
        }
        Array[AnyRef](UTF8String.concatWs(Space, parts: _*))
      } else gramsOf(toks, k)
    }
    val g = grams.length
    if (g == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val md = md5Local.get()
    val gh = new Array[Long](g)
    var i = 0
    while (i < g) {
      md.reset()
      val d = md.digest(grams(i).asInstanceOf[UTF8String].getBytes)
      // First 15 hex chars = the first 60 bits: 7 full bytes + the high
      // nibble of byte 7 (conv(substring(hex, 1, 15), 16, 10) exactly).
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      gh(i) = (v << 4) | ((d(7) & 0xf0L) >> 4)
      i += 1
    }
    val out = new java.util.LinkedHashSet[AnyRef]()
    if (g < w) {
      var mn = gh(0); i = 1
      while (i < g) { if (gh(i) < mn) mn = gh(i); i += 1 }
      out.add(java.lang.Long.valueOf(mn))
    } else {
      var s = 0
      while (s + w <= g) {
        var mn = gh(s)
        var j = s + 1
        while (j < s + w) { if (gh(j) < mn) mn = gh(j); j += 1 }
        out.add(java.lang.Long.valueOf(mn))
        s += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  /** (pos, gram) structs for every n-gram position — the substr-anchor
    * builder's `transform(sequence(1, |toks|−n+1), i => struct(i,
    * concat_ws(" ", slice(toks, i, n))))` exactly (1-based positions;
    * fewer than n tokens → empty).
    */
  def posGrams(toks: ArrayData, n: Int): ArrayData = {
    val grams = gramsOf(toks, n)
    val out = new Array[Any](grams.length)
    var i = 0
    while (i < grams.length) {
      out(i) = new GenericInternalRow(Array[Any](i + 1, grams(i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex32(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
    out
  }

  private val SeedA = "a:".getBytes("UTF-8")
  private val SeedB = "b:".getBytes("UTF-8")

  /** The 4 LSH band keys of a shingle set — `Dedup.bandKeyArray` over the
    * per-shingle seeded md5 arrays, as ONE native pass. Exact semantics
    * of the Column form (spec-pinned kernel ≡ column): per shingle two
    * seeded md5 hex strings; h_i = the minimum over shingles of hex
    * chars [8i, 8i+8) — minimising the fixed-width lowercase hex
    * substring IS minimising the corresponding unsigned 32-bit digest
    * word, so the mins track as integers; band key b =
    * md5(h_{2b} ++ h_{2b+1}) in hex. Empty (or all-null) sets yield
    * four NULL keys, exactly the column form's null-propagation — the
    * consumers' isNotNull-on-generated-attribute filter drops them.
    */
  def bandKeys(sset: ArrayData): ArrayData = {
    val sz = sset.numElements()
    val md = md5Local.get()
    val mins = Array.fill(8)(0xffffffffL + 1)
    var any = false
    var r = 0
    while (r < sz) {
      if (!sset.isNullAt(r)) {
        any = true
        val sb = sset.getUTF8String(r).getBytes
        md.reset(); md.update(SeedA); md.update(sb)
        val da = md.digest()
        md.reset(); md.update(SeedB); md.update(sb)
        val db = md.digest()
        var i = 0
        while (i < 4) {
          val va = ((da(4 * i) & 0xffL) << 24) | ((da(4 * i + 1) & 0xffL) << 16) |
            ((da(4 * i + 2) & 0xffL) << 8) | (da(4 * i + 3) & 0xffL)
          if (va < mins(i)) mins(i) = va
          val vb = ((db(4 * i) & 0xffL) << 24) | ((db(4 * i + 1) & 0xffL) << 16) |
            ((db(4 * i + 2) & 0xffL) << 8) | (db(4 * i + 3) & 0xffL)
          if (vb < mins(4 + i)) mins(4 + i) = vb
          i += 1
        }
      }
      r += 1
    }
    if (!any)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](null, null, null, null))
    val hs = new Array[Array[Byte]](8)
    var i = 0
    while (i < 8) {
      val h = new Array[Byte](8)
      var j = 0
      while (j < 8) {
        h(j) = HexDigits(((mins(i) >> (28 - 4 * j)) & 0xfL).toInt).toByte
        j += 1
      }
      hs(i) = h
      i += 1
    }
    val keys = new Array[Any](4)
    var b = 0
    while (b < 4) {
      md.reset(); md.update(hs(2 * b)); md.update(hs(2 * b + 1))
      keys(b) = UTF8String.fromBytes(hex32(md.digest()))
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  /** Consecutive-token bigram structs — `zip_with(slice(tk,1,n−1),
    * slice(tk,2,n−1), struct)` exactly; fewer than 2 tokens → NULL (the
    * former when-without-otherwise). Null tokens pass through as null
    * struct fields.
    */
  def bigrams(tk: ArrayData): ArrayData = {
    val sz = tk.numElements()
    if (sz < 2) return null
    val out = new Array[Any](sz - 1)
    var i = 0
    while (i < sz - 1) {
      out(i) = new GenericInternalRow(Array[Any](
        if (tk.isNullAt(i)) null else tk.getUTF8String(i),
        if (tk.isNullAt(i + 1)) null else tk.getUTF8String(i + 1)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** SimHash signature over a token array — the former
    * explode → per-token `conv(substring(md5(tok), 1, hexChars), 16, 10)`
    * → per-doc ±1 vote AGGREGATION (a corpus-wide doc_id exchange) as
    * one per-row pass: every token OCCURRENCE votes each of the low
    * `bits` bits of its leading-`hexChars`-nibble digest value, bit b
    * of the signature sets iff its vote sum is positive. Matches the
    * streaming Scala twin (StreamingNearDup.simhash64OfTokens)
    * bit-for-bit at bits = 60 (spec-pinned).
    */
  def simhash(toks: ArrayData, bits: Int, hexChars: Int): Long = {
    val md = md5Local.get()
    val votes = new Array[Long](bits)
    val sz = toks.numElements()
    var i = 0
    while (i < sz) {
      if (!toks.isNullAt(i)) {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        // Leading hexChars nibbles of the digest, MSB-first — exactly
        // conv(substring(hex, 1, hexChars), 16, 10).
        var v = 0L
        var nib = 0
        while (nib < hexChars) {
          val b = d(nib >> 1) & 0xff
          v = (v << 4) | (if ((nib & 1) == 0) b >> 4 else b & 0xf)
          nib += 1
        }
        var b = 0
        while (b < bits) {
          votes(b) += (if (((v >> b) & 1L) == 1L) 1L else -1L)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** Longest run (count, gram) over the ASCENDING-sorted word n-grams of
    * `toks` — semantics of the former sort+fold chain exactly: grams are
    * `concat_ws(" ", toks[i..i+n-1])` (null elements skipped, matching
    * concat_ws), ties on the run length resolve to the FIRST = smallest
    * gram (strict `>`), and a document with fewer than `n` tokens yields
    * (0, "").
    */
  def topNgram(toks: ArrayData, n: Int): InternalRow = {
    val grams = gramsOf(toks, n)
    val k = grams.length
    if (k == 0)
      return new GenericInternalRow(
        Array[Any](0L, UTF8String.EMPTY_UTF8))
    java.util.Arrays.sort(grams)
    var best = 0L
    var bestg: UTF8String = UTF8String.EMPTY_UTF8
    var run = 0L
    var prev: UTF8String = null
    var i = 0
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

/** array<string> of position-ordered word n-grams (see
  * [[TextKernels.ngramArray]]). NULL input → NULL.
  */
case class NgramArrayExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"NgramArrayExpr n=$n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_array requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "ngram_array"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.ngramArray(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.ngramArray($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): NgramArrayExpr = copy(child = newChild)
}

/** array<string> of distinct shingles with the short-doc fallbacks (see
  * [[TextKernels.shingles]]). NULL input → NULL.
  */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ShinglesExpr n=$n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingles"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.shingles(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.shingles($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): ShinglesExpr = copy(child = newChild)
}

/** array<bigint> winnowing fingerprints (see
  * [[TextKernels.winnowFingerprints]]). NULL input → NULL.
  */
case class WinnowFingerprintsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1, s"gram width k=$k must be >= 1")
  require(w >= 1, s"window w=$w must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.winnowFingerprints(a.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.winnowFingerprints($c, $k, $w)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprintsExpr = copy(child = newChild)
}

/** array<struct<pos:int,gram:string>> n-gram anchors (see
  * [[TextKernels.posGrams]]). NULL input → NULL.
  */
case class PosGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"PosGramsExpr n=$n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pos_grams requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "pos_grams"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.posGrams(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.posGrams($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): PosGramsExpr = copy(child = newChild)
}

/** array<string> of the 4 LSH band keys of a shingle set (see
  * [[TextKernels.bandKeys]]; containsNull = true — empty sets yield four
  * NULL keys). NULL input → NULL.
  */
case class BandKeysExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"band_keys requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def prettyName: String = "band_keys"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.bandKeys(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.bandKeys($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BandKeysExpr = copy(child = newChild)
}

/** array<struct<w1:string,w2:string>> consecutive bigrams (see
  * [[TextKernels.bigrams]]; < 2 tokens → NULL, matching the former
  * guarded zip_with). NULL input → NULL.
  */
case class BigramsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bigrams requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType, nullable = true),
    StructField("w2", StringType, nullable = true))),
    containsNull = false)

  // NULL for < 2 tokens even on a non-null input (the former
  // when-without-otherwise) — without the override nullSafeCodeGen
  // would emit `false = true;` for non-nullable children (the
  // SortedLongIntersectCount lesson).
  override def nullable: Boolean = true

  override def prettyName: String = "bigrams"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.bigrams(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("bigrams")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         |  graft.functions.TextKernels.bigrams($c);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): BigramsExpr = copy(child = newChild)
}

/** BIGINT SimHash signature of a token array (see
  * [[TextKernels.simhash]]). NULL input → NULL.
  */
case class SimhashExpr(child: Expression, bits: Int, hexChars: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits=$bits outside [1, 63]")
  require(hexChars >= 1 && hexChars <= 16,
    s"hexChars=$hexChars outside [1, 16]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash"

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.simhash(a.asInstanceOf[ArrayData], bits, hexChars)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.simhash($c, $bits, $hexChars)")

  override protected def withNewChildInternal(
      newChild: Expression): SimhashExpr = copy(child = newChild)
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

  /** Codegen'd position-ordered word n-grams. */
  def ngramArray(toks: Column, n: Int): Column =
    GraftExpressionShim.column(NgramArrayExpr(
      GraftExpressionShim.expression(toks), n))

  /** Codegen'd distinct shingles (short-doc fallbacks included). */
  def shingles(toks: Column, n: Int): Column =
    GraftExpressionShim.column(ShinglesExpr(
      GraftExpressionShim.expression(toks), n))

  /** Codegen'd winnowing fingerprint array. */
  def winnowFingerprints(toks: Column, k: Int, w: Int): Column =
    GraftExpressionShim.column(WinnowFingerprintsExpr(
      GraftExpressionShim.expression(toks), k, w))

  /** Codegen'd (pos, gram) n-gram anchors. */
  def posGrams(toks: Column, n: Int): Column =
    GraftExpressionShim.column(PosGramsExpr(
      GraftExpressionShim.expression(toks), n))

  /** Codegen'd 4-element LSH band-key array. */
  def bandKeys(sset: Column): Column =
    GraftExpressionShim.column(BandKeysExpr(
      GraftExpressionShim.expression(sset)))

  /** Codegen'd per-row SimHash signature. */
  def simhash(toks: Column, bits: Int, hexChars: Int): Column =
    GraftExpressionShim.column(SimhashExpr(
      GraftExpressionShim.expression(toks), bits, hexChars))

  /** Codegen'd consecutive-bigram struct array (NULL below 2 tokens). */
  def bigrams(tk: Column): Column =
    GraftExpressionShim.column(BigramsExpr(
      GraftExpressionShim.expression(tk)))
}
