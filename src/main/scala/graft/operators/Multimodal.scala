package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Barrier.BarrierOps

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, decoded batch-wise via `mapPartitions` (the Scala analog of a
  * pandas-batch UDF: one iterator per partition, amortized per-batch
  * setup). The decode itself is a clearly-marked DETERMINISTIC STUB — the
  * image/audio codecs aren't in this environment — but the Spark-side
  * contract (schema, partitioning, batch iteration, null-safety) is real
  * and oracle-tested.
  *
  * Scale: decode is per-partition map work with no shuffle; payload bytes
  * never leave the executor that scanned them. On a real pipeline the stub
  * body is replaced by the codec call; nothing else changes.
  */
object Multimodal {

  final case class Payload(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, byte_len: Long, width: Int, height: Int, channels: Int,
      checksum: String)

  /** Attach a binary payload column (here: the utf-8 bytes of `text` —
    * the driver tables carry no real media; the column TYPE is the point).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))

  /** The typed payload rows every batch kernel consumes — null-id rows
    * DROP here (the round-13 family rule, in ONE place): `Payload.doc_id`
    * is a primitive Long, so a null id otherwise kills the whole job
    * with an uncurated "Null value appeared in non-nullable field"
    * encoder failure deep inside a task — while the sibling index
    * builds (dedup, ANN, lex) drop such rows. Per-doc media oracles
    * mirror the filter (`doc_id IS NOT NULL`).
    */
  private def payloadRows(payloads: DataFrame): Dataset[Payload] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.where(col("doc_id").isNotNull)
      .select(col("doc_id"), col("payload")).as[Payload]
  }

  /** Table-based byte→hex — ONE kernel for every hot hashing loop (the
    * StreamingNearDup.md5Hex lesson: per-byte `"%02x".format` allocates
    * a boxed java.util.Formatter per BYTE, pure overhead on corpus-wide
    * per-row digests).
    */
  private[graft] val HexChars = "0123456789abcdef".toCharArray
  private[graft] def bytesToHex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = HexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** STUB decode: derive fake-but-deterministic media dimensions from the
    * payload length. A real implementation calls the codec here; the
    * (byte_len, width, height, channels, checksum) contract is unchanged.
    * Channels cycle through realistic counts (1 grayscale / 3 RGB /
    * 4 RGBA) by length rather than pinning 3 — a constant channel column
    * would make its oracle check vacuous (verified-constant class).
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val channels = (n % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
    (64 + (n % 64) * 16, 64 + ((n / 64) % 64) * 16, channels)
  }

  /** Batch decode via mapPartitions: the iterator-in/iterator-out shape
    * that lets a real decoder reuse per-partition codec state.
    */
  def decodeMeta(spark: SparkSession, payloads: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloadRows(payloads)
      .mapPartitions { it =>
        // Per-partition setup happens once here (codec init in real life);
        // MessageDigest is stateful-but-resettable, so ONE instance serves
        // the whole partition (digest() auto-resets after each call).
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { p =>
          val bytes = Option(p.payload).getOrElse(Array.emptyByteArray)
          val (w, h, c) = decodeStub(bytes)
          MediaMeta(p.doc_id, bytes.length.toLong, w, h, c,
            bytesToHex(md.digest(bytes)))
        }
      }
  }

  /** Assembled query: payload metadata for every document. */
  def mediaMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(spark, withPayload(docs)).toDF()

  final case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, thumb: Array[Byte])
  final case class Frame(
      doc_id: Long, frame_idx: Long, offset: Long, frame: Array[Byte])

  /** Resize stage: same mapPartitions batch contract as [[decodeMeta]].
    * The STUB "resample" keeps every k-th byte where a real kernel would
    * interpolate pixels — deterministic, size-contracted output (a thumb
    * is never larger than `maxDim²` bytes), null-safe.
    */
  def resizeThumbs(spark: SparkSession, payloads: DataFrame,
      maxDim: Int = 32): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(maxDim > 0, s"maxDim=$maxDim must be positive")
    payloadRows(payloads)
      .mapPartitions { it =>
        it.map { p =>
          val bytes = Option(p.payload).getOrElse(Array.emptyByteArray)
          val (w, h, _) = decodeStub(bytes)
          // Long arithmetic throughout: maxDim * h and tw * th overflow
          // Int past maxDim ~46k — a negative/zero budget would either
          // divide-by-zero in an executor or silently emit the WHOLE
          // payload as the "thumb" (breaking the maxDim² contract). The
          // short side is <= maxDim so the .toInt is exact.
          val (tw, th) = // fit into maxDim × maxDim, aspect preserved
            if (w >= h)
              (maxDim,
                math.max(1L, maxDim.toLong * h / math.max(1, w)).toInt)
            else
              (math.max(1L, maxDim.toLong * w / math.max(1, h)).toInt,
                maxDim)
          val budget = tw.toLong * th
          // CEILING division: floor would give step=1 for any length in
          // (budget, 2·budget) and emit a thumb up to 2× the documented
          // maxDim² bound (the oracle mirrors this formula).
          val step = math.max(1L,
            (bytes.length.toLong + budget - 1) / budget)
          val thumb = bytes.indices.by(step.toInt).map(bytes).toArray
          ResizedMedia(p.doc_id, tw, th, thumb)
        }
      }
  }

  final case class FrameFeatures(
      doc_id: Long, frame_idx: Long, f0: Long, f1: Long, f2: Long, f3: Long)

  /** Feature extraction over sampled frames: a fixed-width vector per
    * frame (here a 4-bin byte-value histogram standing in for an
    * embedding-model forward pass) via the same batch iterator contract —
    * per-partition model setup would live where the comment marks it.
    * Downstream this column feeds the [[Similarity]] ANN suite.
    */
  def frameFeatures(spark: SparkSession, payloads: DataFrame,
      frameBytes: Int = 16, everyNth: Int = 4): Dataset[FrameFeatures] = {
    import spark.implicits._
    sampleFrames(spark, payloads, frameBytes, everyNth) // guards there
      .mapPartitions { it =>
        // Per-partition setup (model/codec load in real life) goes here.
        it.map { fr =>
          val bins = new Array[Long](4)
          fr.frame.foreach { b =>
            val v = b & 0xff
            val bin = if (v < 64) 0 else if (v < 96) 1 else if (v < 128) 2 else 3
            bins(bin) += 1
          }
          FrameFeatures(fr.doc_id, fr.frame_idx, bins(0), bins(1), bins(2), bins(3))
        }
      }
  }

  /** Media near-duplicates by CHUNK-HASH overlap: two payloads are
    * near-dups when they share at least `minShared` distinct sampled
    * frames byte-for-byte (frame identity = md5 of the frame bytes) —
    * the content-defined-chunk dedup recipe storage systems and video
    * near-dup pipelines run when no decoder is available or affordable,
    * and the natural FIRST dedup pass over a 100 TB media crawl (a
    * re-encoded copy needs the perceptual pass; a byte-identical rip,
    * the overwhelmingly common case, is caught here for hash-join
    * money). Perceptual hashing over decoded pixels would slot into the
    * same fingerprint contract once a real codec replaces the stub.
    *
    * Shape: [[sampleFrames]] (map-only, frames never leave their
    * scanning executor) → md5 fingerprints, DISTINCT per doc (a payload
    * that internally repeats a chunk must not multiply its pair
    * counts) → [[TextAnalysis.sharedFingerprintPairs]], the SAME
    * df-capped self-join discipline the winnowing family uses: a
    * boilerplate chunk (codec headers, silence, black frames) shared by
    * f payloads would contribute f² join rows, so fingerprints in more
    * than `maxDf` docs are dropped first.
    */
  def frameDups(spark: SparkSession, payloads: DataFrame,
      frameBytes: Int = 16, everyNth: Int = 4, minShared: Int = 2,
      maxDf: Int = 50): DataFrame = {
    // Barriered like the winnowing caller: sharedFingerprintPairs reads
    // its input from TWO plan branches (the df aggregation and the join
    // probe) — unmaterialized, the whole sample+md5+distinct pipeline
    // would run per branch. Released in finally (the session's
    // leak-on-failure discipline); the pair result returns eagerly
    // materialized from the callee.
    // Batch-family guard parity with the streaming twin: maxDf <= 0 used
    // to return silently-empty output (sharedFingerprintPairs filters
    // df <= maxDf) while streamingPerceptualDups threw — the ported
    // batch-default-0-means-uncapped trap (the StreamingNearDup wave-11
    // lesson) must fail loudly on BOTH paths.
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    require(maxDf >= 1, s"maxDf=$maxDf must be >= 1")
    val fp = frameFingerprints(spark, payloads, frameBytes, everyNth)
      .barrier()
    try TextAnalysis.sharedFingerprintPairs(fp, minShared, maxDf)
    finally Barrier.release(fp)
  }

  /** [[frameDups]]' fingerprint table, factored for the plan lock (the
    * barrier above hides it from the pair query's visible plan): frame
    * sampling and hashing are narrow map work; the per-doc DISTINCT is
    * the stage's only exchange, and it moves 16-byte hashes, not frames.
    */
  private[graft] def frameFingerprints(spark: SparkSession,
      payloads: DataFrame, frameBytes: Int, everyNth: Int): DataFrame =
    sampleFrames(spark, payloads, frameBytes, everyNth).toDF()
      .select(col("doc_id"), md5(col("frame")).as("fingerprint"))
      .distinct()

  /** The perceptual kernel shared by the batch fingerprints and the
    * streaming twin — ONE implementation so stream ≡ batch holds by
    * construction, not by a hand-synced replica (the wsTokensScala
    * lesson): per sampled frame (every `everyNth`-th `frameBytes` slice,
    * trailing partial dropped — [[sampleFrames]]' walk), the 16-bin
    * high-nibble intensity histogram serialized `c0:…:c15`, DISTINCT per
    * payload in first-seen order.
    */
  private[graft] def perceptualFrameHistograms(bytes: Array[Byte],
      frameBytes: Int, everyNth: Int): Array[String] = {
    val n = if (bytes == null) 0 else bytes.length
    val frames = n / frameBytes
    val out = scala.collection.mutable.LinkedHashSet[String]()
    var i = 0
    while (i < frames) {
      val off = i * frameBytes
      val bins = new Array[Int](16)
      var j = 0
      while (j < frameBytes) {
        bins((bytes(off + j) & 0xff) >> 4) += 1
        j += 1
      }
      out += bins.mkString(":")
      i += everyNth
    }
    out.toArray
  }

  /** Integer DCT-II cosine table for `n`-byte frames:
    * `T(k)(j) = rint(cos(π(j+0.5)(k+1)/n) · 2^14)` — the AC rows only
    * (k+1 = 1..n−1; the DC row is deliberately absent). `rint`
    * (half-even) is SYMMETRIC (`rint(-x) = -rint(x)`), and the analytic
    * `Σ_j cos(π(j+0.5)k/n) = 0` cancellation pairs each sample with its
    * exact negative, so every AC row sums to EXACTLY zero after
    * rounding — which makes [[perceptualFramePHashes]] invariant to a
    * constant brightness shift BY CONSTRUCTION, not by float accident
    * (spec-pinned). The same table is interpolated into the oracle SQL,
    * so both engines share one integer artifact.
    */
  private val dctTableCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Long]]]()

  private[graft] def dctCosTable(n: Int): Array[Array[Long]] =
    // Memoized per JVM (driver AND each executor): the kernel calls this
    // once per PAYLOAD ROW — unmemoized, every row re-paid ~n² cos+rint
    // calls and n array allocations for a table that depends only on
    // frameBytes. Callers treat the shared arrays as read-only.
    dctTableCache.computeIfAbsent(n, k =>
      Array.tabulate(k - 1, k)((ki, j) =>
        math.rint(math.cos(math.Pi * (j + 0.5) * (ki + 1) / k) * 16384.0)
          .toLong))

  /** DCT pHash per sampled frame — the "real codec" upgrade slot of
    * [[perceptualFrameHistograms]], selected by the `pHash` flag on the
    * public entry points: per frame, the n−1 integer AC coefficients
    * (byte values × the fixed-point [[dctCosTable]] — exact long
    * arithmetic end to end), thresholded at their exact median (strict
    * `>`; the middle element of the sorted odd-length AC vector),
    * serialized as a bit string. Complementary robustness to the
    * histogram: EXACTLY invariant under a constant brightness shift
    * (zero row sums move only the absent DC term) while a pixel
    * permutation — which the histogram is blind to — re-keys it. Same
    * output contract: string key per frame, distinct per payload in
    * first-seen order.
    */
  /** The AC coefficient vector of one frame — the shared integer-DCT
    * core of [[perceptualFramePHashes]] and [[perceptualFrameHash30s]].
    */
  private def frameAcCoefs(bytes: Array[Byte], off: Int,
      t: Array[Array[Long]], frameBytes: Int): Array[Long] = {
    val coefs = new Array[Long](frameBytes - 1)
    var k = 0
    while (k < frameBytes - 1) {
      var s = 0L
      var j = 0
      while (j < frameBytes) {
        s += (bytes(off + j) & 0xff).toLong * t(k)(j)
        j += 1
      }
      coefs(k) = s
      k += 1
    }
    coefs
  }

  private[graft] def perceptualFramePHashes(bytes: Array[Byte],
      frameBytes: Int, everyNth: Int): Array[String] = {
    val t = dctCosTable(frameBytes)
    val n = if (bytes == null) 0 else bytes.length
    val frames = n / frameBytes
    val out = scala.collection.mutable.LinkedHashSet[String]()
    var i = 0
    while (i < frames) {
      val coefs = frameAcCoefs(bytes, i * frameBytes, t, frameBytes)
      val med = coefs.sorted.apply(coefs.length / 2)
      val sb = new java.lang.StringBuilder(coefs.length)
      var k = 0
      while (k < coefs.length) {
        sb.append(if (coefs(k) > med) '1' else '0')
        k += 1
      }
      out += sb.toString
      i += everyNth
    }
    out.toArray
  }

  /** TWO-LEVEL quantized DCT pHash per sampled frame, as a 2(n−1)-bit
    * integer: per AC coefficient, one bit for `coef > median` (the
    * [[perceptualFramePHashes]] rule — high bit half) and one for
    * `coef > upper quartile` (the sorted vector's index 3(n−1)/4 — low
    * bit half). Both thresholds are order statistics of the coefficient
    * vector, so the hash inherits the EXACT brightness-shift invariance
    * of the one-level form (zero AC row sums shift no coefficient at
    * all). The second level exists for the HAMMING-tolerant tier: the
    * one-level hash is a constant-weight code (exactly (n−1)/2 ones
    * modulo ties), so every nonzero distance is EVEN and 15 bits give a
    * 3-way pigeonhole only 5 bits of key — two levels double the key
    * space (10-bit blocks at frameBytes = 16) without touching the
    * exact tier's contract.
    */
  private[graft] def perceptualFrameHash30s(bytes: Array[Byte],
      frameBytes: Int, everyNth: Int): Array[Long] = {
    val t = dctCosTable(frameBytes)
    val n = if (bytes == null) 0 else bytes.length
    val frames = n / frameBytes
    val l = frameBytes - 1
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    var i = 0
    while (i < frames) {
      val coefs = frameAcCoefs(bytes, i * frameBytes, t, frameBytes)
      val sorted = coefs.sorted
      val med = sorted(l / 2)
      val q3 = sorted((3 * l) / 4)
      var v = 0L
      var k = 0
      while (k < l) {
        if (coefs(k) > med) v |= 1L << (2 * l - 1 - k)
        if (coefs(k) > q3) v |= 1L << (l - 1 - k)
        k += 1
      }
      out += v
      i += everyNth
    }
    out.toArray
  }

  /** PERCEPTUAL frame fingerprint: the 16-bin intensity histogram of the
    * frame's bytes (bin = high nibble), serialized `c0:c1:…:c15`. With
    * the stub codec the "pixels" ARE the payload bytes, so the kernel is
    * the cheapest genuinely-perceptual descriptor available: invariant
    * to every within-frame pixel PERMUTATION (rotation, mirroring,
    * scan-order changes — the transforms a byte hash is blind to) while
    * content changes that alter the intensity distribution re-key it.
    * `pHash = true` selects the [[perceptualFramePHashes]] DCT
    * descriptor instead — the decodable-codec gate: with a real codec
    * the decode step feeds pixels to the same one function; under the
    * stub the bytes are the pixels either way. The fingerprint contract
    * (string key per frame, distinct per doc, df-capped self-join) is
    * identical on both branches.
    */
  private[graft] def perceptualFingerprints(spark: SparkSession,
      payloads: DataFrame, frameBytes: Int, everyNth: Int,
      pHash: Boolean = false): DataFrame = {
    import spark.implicits._
    // Driver-side requires, matching [[sampleFrames]]: everyNth = 0 would
    // spin the kernel's `i += everyNth` walk forever ON AN EXECUTOR (a
    // hang, not an error), and frameBytes = 0 a bare ArithmeticException
    // after task retries — both must fail at construction with the knob's
    // name instead.
    require(frameBytes > 0, s"frameBytes=$frameBytes must be positive")
    require(everyNth > 0, s"everyNth=$everyNth must be positive")
    // Below 4 bytes the pHash is DEGENERATE, not just weak: 1 byte has
    // no AC coefficients (empty string), and with 1 or 2 coefficients
    // the strict > median test is constant-false for EVERY input ("0" /
    // "00" — verified), so every payload would collapse onto one global
    // hot key and the pair query silently returns empty for any corpus.
    require(!pHash || frameBytes >= 4,
      s"frameBytes=$frameBytes must be >= 4 for the DCT pHash descriptor" +
        " (fewer than 3 AC coefficients makes the median bit test" +
        " constant)")
    val kernel: (Array[Byte], Int, Int) => Array[String] =
      if (pHash) perceptualFramePHashes else perceptualFrameHistograms
    payloadRows(payloads)
      .mapPartitions { it =>
        it.flatMap { p =>
          kernel(p.payload, frameBytes, everyNth)
            .iterator.map(fp => (p.doc_id, fp))
        }
      }
      .toDF("doc_id", "fingerprint")
      .distinct()
  }

  /** Pigeonhole block geometry of the two-level pHash — ONE definition of
    * the bit layout, the block cuts, and the degenerate-geometry guards,
    * shared by the batch near-dup, its streaming twin, and the persisted
    * [[MediaIndex]] (whose at-rest block keys must match the serve-time
    * split BIT FOR BIT across index generations).
    */
  private[graft] final case class BlockGeom(totalBits: Int, blocks: Int,
      cuts: IndexedSeq[Int]) {
    def blockKey(v: Column, b: Int): Column =
      shiftright(v, cuts(b))
        .bitwiseAND(lit((1L << (cuts(b + 1) - cuts(b))) - 1))
    /** One struct(b, bk) per block, for an `explode_outer` over a hash
      * column (the exploder convention: outer + isNotNull on the
      * exploded attribute — the InferFiltersFromGenerate rule).
      */
    def blockStructs(v: Column): Column =
      array((0 until blocks).map(b =>
        struct(lit(b).as("b"), blockKey(v, b).as("bk"))): _*)
  }

  private[graft] def blockGeom(frameBytes: Int, maxDist: Int): BlockGeom = {
    require(frameBytes >= 8,
      s"frameBytes=$frameBytes must be >= 8 for the two-level pHash" +
        " (narrower frames leave too few AC coefficients between the" +
        " median and quartile thresholds)")
    // Upper bound: the two-level hash packs 2(frameBytes−1) bits into a
    // Long — the kernel's high-half shift is 2(frameBytes−1)−1, which at
    // frameBytes >= 34 exceeds 63 and WRAPS mod 64, silently colliding
    // high-half bits onto low-half quartile bits of other coefficients
    // (corrupt hashes, wrong Hamming distances, a near-constant hot top
    // block — and nothing ever throws).
    require(frameBytes <= 33,
      s"frameBytes=$frameBytes packs 2*(frameBytes-1) > 64 hash bits " +
        "into a 64-bit value — the two-level pHash caps at frameBytes=33")
    val totalBits = 2 * (frameBytes - 1)
    val blocks = maxDist + 1
    val cuts = (0 to blocks).map(j => j * totalBits / blocks)
    // The pigeonhole needs maxDist+1 blocks; a block narrower than 4
    // bits is a <=15-value key space whose every key is hot at any
    // scale — the cap would then fence EVERYTHING (silently empty
    // output), so refuse the degenerate geometry at construction.
    require(maxDist >= 1 && cuts.sliding(2).forall(p => p(1) - p(0) >= 4),
      s"maxDist=$maxDist needs ${blocks} blocks over $totalBits hash " +
        "bits — block keys would be under 4 bits (every key hot)")
    BlockGeom(totalBits, blocks, cuts)
  }

  /** Exploded (id, v, b, bk) block rows over an (id, v) hash table — THE
    * outer + isNotNull exploder pattern for pigeonhole block keys, in
    * ONE definition (three hand-synced copies across the batch op, the
    * streaming twin, and the persisted index were the bandKeyArray
    * drift class: a struct-layout or explode-discipline change had to
    * land in all three).
    */
  private[graft] def explodedBlockRows(hashes: DataFrame, geom: BlockGeom,
      idCol: String): DataFrame =
    hashes.select(col(idCol), col("v"),
        explode_outer(geom.blockStructs(col("v"))).as("blk"))
      .where(col("blk").isNotNull)
      .select(col(idCol), col("v"),
        col("blk.b").as("b"), col("blk.bk").as("bk"))

  /** One DISTINCT (doc_id, v) row per two-level pHash per payload — the
    * shared hash leg of the Hamming-tolerant family (batch, streaming
    * twin, persisted index build and serve all feed from this).
    */
  private[graft] def hash30Rows(spark: SparkSession, payloads: DataFrame,
      frameBytes: Int, everyNth: Int): DataFrame = {
    import spark.implicits._
    require(everyNth > 0, s"everyNth=$everyNth must be positive")
    // Guard parity with perceptualFingerprints: frameBytes = 0 would
    // otherwise surface as a bare executor-side ArithmeticException
    // after task retries instead of this named construction-time
    // failure (every current caller routes through blockGeom's 8..33
    // require first — this is the defense for future direct callers).
    require(frameBytes > 0, s"frameBytes=$frameBytes must be positive")
    payloadRows(payloads)
      .mapPartitions { it =>
        it.flatMap { p =>
          perceptualFrameHash30s(p.payload, frameBytes, everyNth)
            .iterator.map(v => (p.doc_id, v))
        }
      }
      .toDF("doc_id", "v")
      .distinct()
  }

  /** Media near-duplicates by PERCEPTUAL frame overlap — the second dedup
    * pass over a media crawl, behind the byte-identical [[frameDups]]
    * pass: two payloads pair when `minShared` sampled frames share an
    * intensity histogram, which catches rotated / re-scanned / pixel-
    * permuted copies whose md5 fingerprints all differ. Same shape as
    * [[frameDups]] end to end: map-only sampling + hashing, one DISTINCT
    * exchange of small string keys, and the df-capped
    * [[TextAnalysis.sharedFingerprintPairs]] self-join (a histogram
    * shared by half the corpus — flat color, silence — is boilerplate
    * and must not quadratically join; the cap drops it first). Coarser
    * keys than md5 ⇒ organically hotter buckets; the cap is doing real
    * work here, not just guarding a pathology.
    */
  def perceptualDups(spark: SparkSession, payloads: DataFrame,
      frameBytes: Int = 16, everyNth: Int = 4, minShared: Int = 2,
      maxDf: Int = 50, pHash: Boolean = false): DataFrame = {
    // Guard parity with the streaming twin (see frameDups).
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    require(maxDf >= 1, s"maxDf=$maxDf must be >= 1")
    val fp = perceptualFingerprints(spark, payloads, frameBytes, everyNth,
      pHash).barrier()
    try TextAnalysis.sharedFingerprintPairs(fp, minShared, maxDf)
    finally Barrier.release(fp)
  }

  /** HAMMING-TOLERANT perceptual near-dup — the fourth media descriptor
    * tier (md5 → histogram → exact pHash → near pHash): two payloads
    * pair when at least `minShared` sampled-frame pairs have two-level
    * DCT pHashes ([[perceptualFrameHash30s]]) within Hamming distance
    * `maxDist` — catching SMALL CONTENT PERTURBATION (sensor noise, a
    * changed pixel run) that re-keys every exact descriptor. Exact
    * matches (distance 0) count too, so the tier subsumes the exact
    * pHash pass.
    *
    * Candidate generation is the SimHash pigeonhole: the 2(frameBytes−1)
    * hash bits split into `maxDist + 1` contiguous blocks, so two hashes
    * within `maxDist` share at least one block VERBATIM — an equi-join
    * per block index, never a Hamming theta-join. `maxBlockDf` fences
    * hot block keys exactly like every LSH family here (flat-spectrum
    * boilerplate frames land on a handful of keys; the cap is the
    * documented one-sided undercount). Output: (doc_a, doc_b, shared),
    * shared = the count of distinct verified (hash_a, hash_b) pairs.
    *
    * Scale shape: map-only hashing, one DISTINCT exchange of (doc, v)
    * longs, block rows barriered (3 small rows per distinct hash), a
    * df-capped equi-join, and the exact `bit_count(xor)` verification
    * map-side on candidates.
    */
  def perceptualNearDups(spark: SparkSession, payloads: DataFrame,
      frameBytes: Int = 16, everyNth: Int = 4, maxDist: Int = 2,
      minShared: Int = 2, maxBlockDf: Int = 100): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    require(maxBlockDf >= 1, s"maxBlockDf=$maxBlockDf must be >= 1")
    val geom = blockGeom(frameBytes, maxDist)
    val fp = hash30Rows(spark, payloads, frameBytes, everyNth)
    val bl = explodedBlockRows(fp, geom, "doc_id")
      .barrier() // read three times: df cap + both join legs
    try {
      val keep = bl.groupBy(col("b"), col("bk"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxBlockDf)
        .select(col("b"), col("bk"))
      val left = bl.select(col("b"), col("bk"),
        col("doc_id").as("doc_a"), col("v").as("va"))
      val right = bl.select(col("b"), col("bk"),
        col("doc_id").as("doc_b"), col("v").as("vb"))
      val cand = left.join(keep, Seq("b", "bk"))
        .join(right, Seq("b", "bk"))
        .where(col("doc_a") < col("doc_b"))
      // The distinct (a pair found through several blocks verifies and
      // counts ONCE) + Hamming verify + minShared tail is the shared
      // [[verifiedPairs]] kernel — the index serves run the same one.
      verifiedPairs(cand, maxDist, minShared)
        .barrier() // tiny; materialized so the finally can release bl
    } finally Barrier.release(bl)
  }

  /** The verify tail every perceptual-pair consumer shares (this batch
    * op + both MediaIndex serve legs): dedupe multi-block discoveries,
    * verify the exact Hamming distance map-side, count distinct
    * verified hash pairs per doc pair, keep pairs sharing at least
    * `minShared`. ONE definition so the verification rule cannot drift
    * between the batch op and the index serves.
    */
  private[graft] def verifiedPairs(cand: DataFrame, maxDist: Int,
      minShared: Int, keyA: String = "doc_a",
      keyB: String = "doc_b"): DataFrame =
    cand.select(col(keyA), col(keyB), col("va"), col("vb"))
      .distinct()
      .where(expr(s"bit_count(va ^ vb) <= $maxDist"))
      .groupBy(col(keyA), col(keyB))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)

  /** Streaming twin of [[perceptualDups]]' cross leg: an INGEST-TIME
    * alert stream of (doc_id, base_id, shared) pairs between arriving
    * payloads and a FROZEN base corpus — the media analog of
    * [[DedupIndex.streamingIndexDups]], and the same contract: a
    * stateless alert stream (at-least-once re-delivery re-alerts; the
    * sink dedupes by pair key), not the exhaustive sweep. Within-stream
    * pairs and the bulk pass stay with the batch operator.
    *
    * Semantics: `shared` counts the arriving payload's sampled-frame
    * histograms also present among the base doc's CAPPED fingerprints —
    * the df cap (boilerplate histograms: flat color, silence) is
    * computed over the BASE corpus, the only side whose df is knowable
    * at ingest time. Exactly-once per pair within a delivery via the
    * smallest-shared-fingerprint rule: of a pair's colliding candidate
    * rows, only the one carrying the lexicographically smallest common
    * fingerprint emits (the streamingIndexDups band rule, keyed on the
    * histogram string).
    *
    * Shape: per-row fingerprints through the SHARED
    * [[perceptualFrameHistograms]] kernel (stream ≡ batch by
    * construction), then one stream-static candidate join on the capped
    * fingerprint table and one on the per-base fingerprint ARRAY — both
    * static sides materialized ONCE at stream construction (a
    * stream-static join re-evaluates its static plan per micro-batch;
    * unmaterialized, the df aggregation would re-shuffle every batch).
    * ZERO streaming state: no watermark, nothing to expire. The base
    * must stay frozen for the stream's lifetime; the barrier blocks
    * release when the driver drops the stream's references.
    */
  def streamingPerceptualDups(spark: SparkSession, basePayloads: DataFrame,
      stream: DataFrame, frameBytes: Int = 16, everyNth: Int = 4,
      minShared: Int = 2, maxDf: Int = 50, pHash: Boolean = false)
      : DataFrame = {
    import spark.implicits._
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    require(maxDf >= 1, s"maxDf=$maxDf must be >= 1")
    // The stream-side kernel calls bypass [[perceptualFingerprints]]'
    // construction-time guards — validate here too (same failure modes:
    // executor hang / bare ArithmeticException).
    require(frameBytes > 0, s"frameBytes=$frameBytes must be positive")
    require(everyNth > 0, s"everyNth=$everyNth must be positive")
    require(!pHash || frameBytes >= 4,
      s"frameBytes=$frameBytes must be >= 4 for the DCT pHash descriptor" +
        " (fewer than 3 AC coefficients makes the median bit test" +
        " constant)")
    // ONE kernel value for both the static side (via
    // perceptualFingerprints) and the per-row stream stage below —
    // stream ≡ batch stays by construction on either descriptor.
    val kernel: (Array[Byte], Int, Int) => Array[String] =
      if (pHash) perceptualFramePHashes else perceptualFrameHistograms
    // Both sides are (doc_id, payload) frames — [[withPayload]] adapts a
    // documents table on the batch side; the stream carries real binary.
    // The base fingerprint pass is BARRIERED before the self-aggregate
    // join (the perceptualDups discipline): capped = baseFp ⋈ rare(baseFp)
    // otherwise plans the whole base hashing pipeline under TWO branches
    // and construction pays it twice (exchange reuse is a runtime maybe).
    // Released once both derived barriers are eagerly materialized —
    // they, not baseFp, are what the stream re-reads per micro-batch.
    val baseFp = perceptualFingerprints(spark,
      basePayloads, frameBytes, everyNth, pHash).barrier()
    val (capped, baseArr) =
      try {
        val rare = baseFp.groupBy(col("fingerprint"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf)
          .select(col("fingerprint"))
        val c = baseFp.join(rare, Seq("fingerprint"))
          .select(col("fingerprint"), col("doc_id").as("base_id"))
          .barrier()
        // Release c on a FAILED baseArr materialization (the dupClusters
        // failure-path rule) — it is already checkpointed by then.
        val a =
          try c.groupBy(col("base_id"))
            .agg(sort_array(collect_set(col("fingerprint"))).as("base_fps"))
            .barrier()
          catch { case t: Throwable => Barrier.release(c); throw t }
        (c, a)
      } finally Barrier.release(baseFp)
    val sigged = payloadRows(stream)
      // payloadRows drops null-id rows — the streaming twins' null rule
      // (a null-id row's alerts would collapse onto one sink key).
      .map(p => (p.doc_id, kernel(p.payload, frameBytes, everyNth)))
      .toDF("doc_id", "fps")
    val common = array_intersect(col("fps"), col("base_fps"))
    sigged
      .select(col("doc_id"), col("fps"),
        explode_outer(col("fps")).as("fingerprint"))
      .where(col("fingerprint").isNotNull)
      .join(capped, Seq("fingerprint"))
      .where(col("doc_id") =!= col("base_id")) // replayed base rows
      .join(baseArr, Seq("base_id"))
      .withColumn("shared", size(common).cast("long"))
      .where(col("shared") >= minShared &&
        col("fingerprint") === array_min(common))
      .select(col("doc_id"), col("base_id"), col("shared"))
  }

  /** Streaming twin of [[perceptualNearDups]]' cross leg: an INGEST-TIME
    * alert stream of (doc_id, base_id, shared) pairs whose sampled-frame
    * pHashes sit within Hamming `maxDist` of a FROZEN base corpus's —
    * the [[streamingPerceptualDups]] contract (stateless alert stream,
    * at-least-once re-delivery re-alerts, base-side-only df caps, both
    * static sides construction-barriered, zero streaming state) over
    * the pigeonhole block machinery.
    *
    * `shared` counts the arriving payload's (hash, base hash) combos
    * with distance ≤ maxDist that share a SURVIVING block key — the
    * batch operator's exact survival rule, so the cross leg equals the
    * batch sweep wherever the base-vs-union df difference doesn't bite
    * (spec-pinned on fixtures below the cap). Each surviving base hash
    * carries its surviving packed (block, key) set, so survival,
    * `shared`, and the exactly-once pick are all per-row expressions:
    * of a pair's candidate rows, only the one carrying the smallest
    * matched stream hash, its smallest matched base hash, and their
    * smallest surviving shared block emits.
    */
  def streamingPerceptualNearDups(spark: SparkSession,
      basePayloads: DataFrame, stream: DataFrame, frameBytes: Int = 16,
      everyNth: Int = 4, maxDist: Int = 2, minShared: Int = 2,
      maxBlockDf: Int = 100): DataFrame = {
    val geom = blockGeom(frameBytes, maxDist)
    val baseFp = hash30Rows(spark, basePayloads, frameBytes, everyNth)
      .withColumnRenamed("doc_id", "base_id")
    val bbl = explodedBlockRows(baseFp, geom, "base_id")
    streamingNearCore(spark, bbl, stream, frameBytes, everyNth, maxDist,
      minShared, maxBlockDf)
  }

  /** The alert-stream core over an already-exploded base block table
    * (base_id, v, b, bk) — shared by the live-payload twin above and
    * [[MediaIndex.streamingMediaIndexDups]], whose base rows come from
    * the persisted index instead of a hash pass (the rows are the SAME
    * deterministic table, so alert semantics are identical by
    * construction). The base must stay frozen for the stream's
    * lifetime; the static sides materialize ONCE at construction.
    */
  private[graft] def streamingNearCore(spark: SparkSession,
      bbl: DataFrame, stream: DataFrame, frameBytes: Int,
      everyNth: Int, maxDist: Int, minShared: Int,
      maxBlockDf: Int): DataFrame = {
    import spark.implicits._
    require(minShared >= 1, s"minShared=$minShared must be >= 1")
    require(maxBlockDf >= 1, s"maxBlockDf=$maxBlockDf must be >= 1")
    val geom = blockGeom(frameBytes, maxDist)
    val blocks = geom.blocks
    def blockKey(v: Column, b: Int): Column = geom.blockKey(v, b)
    // (block, key) packed into one long for array membership tests —
    // block index in the high bits, so the array MIN is also the
    // smallest block (the exactly-once tie-break below).
    def packedRow(b: Column, bk: Column): Column =
      shiftleft(b.cast("long"), 32).bitwiseOR(bk)
    def fKeys(f: Column): Column =
      array((0 until blocks).map(b =>
        lit(b.toLong << 32).bitwiseOR(blockKey(f, b))): _*)
    // A (stream hash f, base hash g) combo MATCHES when it verifies AND
    // some shared block key survived the cap — membership of one of f's
    // packed keys in g's surviving-key set is exactly that condition
    // (equal packed values ⇒ same block index and same key bits).
    def matched(f: Column, gv: Column, gkk: Column): Column =
      (bit_count(f.bitwiseXOR(gv)) <= maxDist) &&
        arrays_overlap(fKeys(f), gkk)
    // ---- static side, materialized ONCE at construction --------------
    // bbl is BARRIERED before the self-aggregate join (the
    // perceptualNearDups discipline): kept = bbl ⋈ keep(bbl) otherwise
    // evaluates the whole base pipeline twice at construction — the full
    // hash pass for the live twin, a double index scan for the
    // index-served one. Released once kept (eager) exists; the stream
    // re-reads kept/baseBook only.
    val bblB = bbl.barrier()
    val kept =
      try {
        val keep = bblB.groupBy(col("b"), col("bk"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxBlockDf)
          .select(col("b"), col("bk"))
        bblB.join(keep, Seq("b", "bk")).barrier()
      } finally Barrier.release(bblB)
    // Per surviving base hash: its surviving packed keys (a hash whose
    // every block was capped drops out here — it can never form a
    // surviving combo, matching the batch candidate rule).
    val baseBook =
      try kept
        .groupBy(col("base_id"), col("v"))
        .agg(sort_array(collect_list(packedRow(col("b"), col("bk"))))
          .as("kk"))
        .groupBy(col("base_id"))
        .agg(sort_array(collect_list(struct(col("v"), col("kk"))))
          .as("bvs"))
        .barrier()
      // kept is already checkpointed — release it on a failed book
      // materialization (the dupClusters failure-path rule).
      catch { case t: Throwable => Barrier.release(kept); throw t }
    // ---- stream side --------------------------------------------------
    val sigged = payloadRows(stream) // drops null-id rows (twins' null rule)
      .map(p => (p.doc_id,
        perceptualFrameHash30s(p.payload, frameBytes, everyNth)))
      .toDF("doc_id", "fps")
    val fBlocks = sigged
      .select(col("doc_id"), col("fps"), explode_outer(col("fps")).as("f"))
      .where(col("f").isNotNull)
      .select(col("doc_id"), col("fps"), col("f"),
        explode_outer(geom.blockStructs(col("f"))).as("blk"))
      .where(col("blk").isNotNull)
      .select(col("doc_id"), col("fps"), col("f"),
        col("blk.b").as("b"), col("blk.bk").as("bk"))
    val joined = fBlocks
      .join(kept.select(col("b"), col("bk"), col("base_id"),
        col("v").as("vb")), Seq("b", "bk"))
      .where(col("doc_id") =!= col("base_id")) // replayed base rows
      .join(baseBook, Seq("base_id"))
    val sharedCol = aggregate(col("fps"), lit(0L), (acc, f) =>
      acc + size(filter(col("bvs"),
        g => matched(f, g("v"), g("kk")))).cast("long"))
    val fminCol = array_min(filter(col("fps"), f =>
      exists(col("bvs"), g => matched(f, g("v"), g("kk")))))
    joined
      .withColumn("shared", sharedCol)
      .withColumn("fmin", fminCol)
      // Lexicographic struct min = smallest matched base hash (v is the
      // leading field; v is distinct per base doc).
      .withColumn("gm", array_min(filter(col("bvs"),
        g => matched(col("fmin"), g("v"), g("kk")))))
      .withColumn("minpk", array_min(filter(fKeys(col("fmin")),
        p => array_contains(col("gm.kk"), p))))
      .where(col("shared") >= minShared &&
        col("f") === col("fmin") &&
        col("vb") === col("gm.v") &&
        packedRow(col("b"), col("bk")) === col("minpk"))
      .select(col("doc_id"), col("base_id"), col("shared"))
  }

  /** Frame sampling for a video-like payload: emit every `everyNth`
    * fixed-size frame slice as its own row (flatMap — the row-multiplying
    * half of the multimodal contract). Frames stay on the executor that
    * scanned the payload; downstream per-frame feature extraction is then
    * ordinary map work over the exploded rows.
    */
  def sampleFrames(spark: SparkSession, payloads: DataFrame,
      frameBytes: Int = 16, everyNth: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    // Driver-side requires: a zero here would otherwise surface as an
    // opaque executor-side ArithmeticException after task retries.
    require(frameBytes > 0, s"frameBytes=$frameBytes must be positive")
    require(everyNth > 0, s"everyNth=$everyNth must be positive")
    payloadRows(payloads)
      .mapPartitions { it =>
        it.flatMap { p =>
          val bytes = Option(p.payload).getOrElse(Array.emptyByteArray)
          val frames = bytes.length / frameBytes // trailing partial dropped
          // Strided ITERATOR, never a strict collection: a strict
          // filter+map materializes every sampled Frame (plus boxed
          // indices) of a payload before the first one streams —
          // gigabytes of heap for one large media row, defeating the
          // one-frame-at-a-time contract the flatMap exists for.
          (0L until frames.toLong by everyNth.toLong).iterator
            .zipWithIndex.map { case (i, n) =>
              val off = i * frameBytes
              Frame(p.doc_id, n.toLong, off,
                java.util.Arrays.copyOfRange(bytes, off.toInt,
                  off.toInt + frameBytes))
            }
        }
      }
  }
}
