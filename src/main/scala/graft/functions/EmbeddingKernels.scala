package graft.functions

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native per-row kernels for the embedding-dedup pipeline
  * (ops/EmbeddingDedup): featurization and LSH signatures computed
  * MAP-SIDE, one document per row, instead of via explode → groupBy
  * passes. The round-12 per-stage profile of the 10× stress pipeline
  * showed where the bytes actually went — 639 MB shuffled to count
  * shingles per (doc, bucket), a 205M-row join+partial-agg to project
  * the LSH planes, and 1.37 GB shuffled to deduplicate candidate pairs
  * by groupBy — all three replaceable by per-row arithmetic on data the
  * row already holds. Each kernel is a Catalyst expression with a
  * codegen path (a static call inside whole-stage codegen — the same
  * extension tier as [[DotProductFloat]]), so featurization becomes a
  * NARROW plan: at 100 TB the featurization shuffle is exactly zero
  * bytes regardless of corpus size.
  *
  * Determinism contract: every kernel reproduces, bit for bit, the
  * arithmetic of the declarative pipeline it replaces (md5-hex bucket
  * hashing, ±1 plane signs from [[graft.ops.VectorSearch.planeSigns]],
  * integer-exact projections), so the DuckDB oracle for
  * d07_embedding_near_dup replays unchanged.
  */
object EmbeddingKernels {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Bucket of one shingle: the first 4 md5 hex digits as an integer,
    * mod dim — i.e. the digest's first two bytes. Identical to the SQL
    * spelling `conv(substring(md5(g), 1, 4), 16, 10) % dim` the oracle
    * replays in DuckDB. */
  def bucketOf(bytes: Array[Byte], dim: Int): Int = {
    val md = md5Local.get()
    md.reset()
    val digest = md.digest(bytes)
    (((digest(0) & 0xFF) << 8) | (digest(1) & 0xFF)) % dim
  }

  /** ±1 plane signs for (planes × tables) LSH tables over dim buckets,
    * flattened [t * planes + j][d], bytes for cache locality. Derived
    * from [[graft.ops.VectorSearch.planeSigns]] — the single public
    * definition of the sign matrices — and memoized per geometry. */
  private val signCache =
    new ConcurrentHashMap[(Int, Int, Int), Array[Array[Byte]]]()

  private[functions] def signMatrix(
      planes: Int, tables: Int, dim: Int): Array[Array[Byte]] =
    signCache.computeIfAbsent((planes, tables, dim), { _ =>
      val out = new Array[Array[Byte]](tables * planes)
      var t = 0
      while (t < tables) {
        val signs = graft.ops.VectorSearch.planeSigns(planes, dim, t)
        var j = 0
        while (j < planes) {
          val row = new Array[Byte](dim)
          var d = 0
          while (d < dim) {
            row(d) = if (signs(j)(d) > 0) 1 else -1
            d += 1
          }
          out(t * planes + j) = row
          j += 1
        }
        t += 1
      }
      out
    })

  /** Register the kernels as SQL-callable functions (idempotent). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_shingle_hist",
      exprs => ShingleHistogram(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_lsh_sig",
      exprs => LshSignature(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_pack_ints",
      exprs => PackInts(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_sig_match",
      exprs => SigMatch(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_sig_keep",
      exprs => SigKeep(exprs(0), exprs(1), exprs(2), exprs(3)), "built-in")
  }

  private[functions] def foldableInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    e.eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$what must be a literal integer, got $other")
    }
  }
}

/** graft_shingle_hist(shingles, dim): hashed-TF histogram of a distinct
  * shingle array — counts[bucketOf(shingle)] += 1 — as array<smallint>.
  * Counts are exact small integers, so smallint halves the verify-join
  * bytes with bit-identical cosines; a single bucket exceeding 32767
  * (an ~8M-word document) fails loudly rather than wrapping. */
case class ShingleHistogram(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StringType, _) if right.foldable &&
        right.dataType == IntegerType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_shingle_hist expects (array<string>, literal int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  private lazy val dim = EmbeddingKernels.foldableInt(right, "dim")

  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def prettyName: String = "graft_shingle_hist"

  def compute(a: ArrayData): ArrayData = {
    val counts = new Array[Short](dim)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val b = EmbeddingKernels.bucketOf(a.getUTF8String(i).getBytes, dim)
        val c = counts(b) + 1
        if (c > 32767) throw new IllegalStateException(
          s"embedding shingle count overflows smallint: $c")
        counts(b) = c.toShort
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHist", this, classOf[ShingleHistogram].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_lsh_sig(counts, planes, tables): sign-random-projection LSH
  * bucket per table, computed per row — projection_j = Σ_d c[d]·sign,
  * bit j set iff positive — as array<int> of length `tables`. Counts
  * are integers, so the long accumulation equals the declarative
  * double-sum form bit for bit regardless of addition order. */
case class LshSignature(
    first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(ShortType, _) if second.foldable && third.foldable &&
        second.dataType == IntegerType && third.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_lsh_sig expects (array<smallint>, literal int, literal int), " +
        s"got ${first.dataType.simpleString}")
  }

  private lazy val planes = EmbeddingKernels.foldableInt(second, "planes")
  private lazy val tables = EmbeddingKernels.foldableInt(third, "tables")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lsh_sig"

  def compute(v: ArrayData): ArrayData = {
    require(planes > 0 && planes < 31, s"planes must be in [1, 30]: $planes")
    val dim = v.numElements()
    val signs = EmbeddingKernels.signMatrix(planes, tables, dim)
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var j = 0
      while (j < planes) {
        val row = signs(t * planes + j)
        var p = 0L
        var d = 0
        while (d < dim) {
          p += v.getShort(d) * row(d)
          d += 1
        }
        if (p > 0) bucket |= 1 << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshSig", this, classOf[LshSignature].getName)
    nullSafeCodeGen(ctx, ev, (a, _, _) => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** graft_pack_ints(arr, width): array<int> → binary, `width` (2 or 4)
  * bytes little-endian per element. The packed form rides the candidate
  * join as the per-row signature payload; at ≤16 planes every bucket id
  * fits two bytes, halving the dominant probe-side shuffle (the 40×
  * stress point measured the 4-byte form at 6 GB/run). Width-2 packing
  * of a value outside [0, 65535] fails loudly. */
case class PackInts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(IntegerType, _) if right.foldable &&
        right.dataType == IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pack_ints expects (array<int>, literal width), got " +
        s"${other.simpleString}")
  }

  private lazy val width = {
    val w = EmbeddingKernels.foldableInt(right, "width")
    require(w == 2 || w == 4, s"pack width must be 2 or 4, got $w")
    w
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pack_ints"

  def compute(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](width * n)
    var i = 0
    while (i < n) {
      val v = a.getInt(i)
      if (width == 2) {
        if (v < 0 || v > 0xFFFF) throw new IllegalStateException(
          s"signature $v does not fit 2-byte packing")
        out(2 * i) = v.toByte
        out(2 * i + 1) = (v >>> 8).toByte
      } else {
        out(4 * i) = v.toByte
        out(4 * i + 1) = (v >>> 8).toByte
        out(4 * i + 2) = (v >>> 16).toByte
        out(4 * i + 3) = (v >>> 24).toByte
      }
      i += 1
    }
    out
  }

  override protected def nullSafeEval(v: Any, w: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("packInts", this, classOf[PackInts].getName)
    nullSafeCodeGen(ctx, ev, (a, _) => s"${ev.value} = $ref.compute($a);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_sig_match(sig1, sig2, width): compare two packed LSH signature
  * vectors table by table. A table AGREES when its buckets are within
  * hamming distance 1 (exactly the reach of 1-bit multiprobe). Returns
  * `(totalBitHamming << 16) | (agreeCount << 8) | firstAgreeingTable` —
  * one int carrying three map-side decisions for a matched candidate
  * row: (a) agreement strength-filtering, (b) exact-once dedup (row
  * table == canonical first agreeing table) replacing the
  * candidate-dedup groupBy the 10× stress profile measured at 1.37 GB
  * of shuffle, and (c) a COSINE ESTIMATE — the buckets are
  * planes×tables INDEPENDENT sign-projection bits, so totalBitHamming/B
  * estimates angle/π with binomial error sqrt(f(1-f)/B), which the
  * caller turns into a conservative pre-verify filter (the 40× stress
  * profile measured 9.2 GB of dense vectors shipped for sub-threshold
  * candidate pairs that 322 sign bits already rule out). */
case class SigMatch(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (BinaryType, BinaryType) if third.foldable &&
          third.dataType == IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_sig_match expects (binary, binary, literal width), got $other")
    }

  private lazy val width = {
    val w = EmbeddingKernels.foldableInt(third, "width")
    require(w == 2 || w == 4, s"pack width must be 2 or 4, got $w")
    w
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sig_match"

  def compute(b1: Array[Byte], b2: Array[Byte]): Int = {
    val n = math.min(b1.length, b2.length) / width
    var agree = 0
    var tMin = 0xFF
    var hamming = 0
    var t = 0
    while (t < n) {
      val s1 =
        if (width == 2) (b1(2 * t) & 0xFF) | ((b1(2 * t + 1) & 0xFF) << 8)
        else (b1(4 * t) & 0xFF) | ((b1(4 * t + 1) & 0xFF) << 8) |
          ((b1(4 * t + 2) & 0xFF) << 16) | ((b1(4 * t + 3) & 0xFF) << 24)
      val s2 =
        if (width == 2) (b2(2 * t) & 0xFF) | ((b2(2 * t + 1) & 0xFF) << 8)
        else (b2(4 * t) & 0xFF) | ((b2(4 * t + 1) & 0xFF) << 8) |
          ((b2(4 * t + 2) & 0xFF) << 16) | ((b2(4 * t + 3) & 0xFF) << 24)
      val h = Integer.bitCount(s1 ^ s2)
      hamming += h
      if (h <= 1) {
        agree += 1
        if (tMin == 0xFF) tMin = t
      }
      t += 1
    }
    (math.min(hamming, 0xFFFF) << 16) | (agree << 8) | tMin
  }

  override protected def nullSafeEval(l: Any, r: Any, w: Any): Any =
    compute(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sigMatch", this, classOf[SigMatch].getName)
    nullSafeCodeGen(ctx, ev, (a, b, _) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** graft_sig_keep(sig1, sig2, rowTable, params): the fused keep/drop
  * decision for one matched candidate row — equivalent to evaluating
  * [[SigMatch]] and then testing `firstAgreeingTable == rowTable AND
  * agreeCount >= minAgree AND totalBitHamming <= hMax`, but with the
  * two structural EARLY EXITS that composition cannot express:
  *  - hamming accumulates monotonically, so the row is dead the moment
  *    the running total crosses hMax — a random pair (the overwhelming
  *    bulk: the 40× stress point feeds 1.38e9 matched rows into this
  *    decision to keep 3.8e5) accrues ~planes/2 bits per table and
  *    exits ~1/3 early;
  *  - an agreeing table BEFORE rowTable means some earlier-table row
  *    canonically owns the pair — exit without scanning the rest.
  * `params` packs (width | minAgree<<8 | hMax<<16) into one literal.
  * The boolean returned is bit-for-bit the composed form's — only
  * evaluation ORDER changes — so the declarative DuckDB oracle for
  * d07_embedding_near_dup replays unchanged (pinned by the spec's
  * equivalence sweep against SigMatch). */
case class SigKeep(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, BinaryType, IntegerType) if fourth.foldable &&
          fourth.dataType == IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_sig_keep expects (binary, binary, int, literal params), got $other")
    }

  private lazy val params = EmbeddingKernels.foldableInt(fourth, "params")
  private lazy val width = {
    val w = params & 0xFF
    require(w == 2 || w == 4, s"pack width must be 2 or 4, got $w")
    w
  }
  private lazy val minAgree = (params >> 8) & 0xFF
  private lazy val hMax = params >>> 16

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_sig_keep"

  def compute(b1: Array[Byte], b2: Array[Byte], rowT: Int): Boolean = {
    val n = math.min(b1.length, b2.length) / width
    val w = width
    val cap = hMax
    var h = 0
    var agree = 0
    var agreedAtRow = false
    var t = 0
    while (t < n) {
      val s1 =
        if (w == 2) (b1(2 * t) & 0xFF) | ((b1(2 * t + 1) & 0xFF) << 8)
        else (b1(4 * t) & 0xFF) | ((b1(4 * t + 1) & 0xFF) << 8) |
          ((b1(4 * t + 2) & 0xFF) << 16) | ((b1(4 * t + 3) & 0xFF) << 24)
      val s2 =
        if (w == 2) (b2(2 * t) & 0xFF) | ((b2(2 * t + 1) & 0xFF) << 8)
        else (b2(4 * t) & 0xFF) | ((b2(4 * t + 1) & 0xFF) << 8) |
          ((b2(4 * t + 2) & 0xFF) << 16) | ((b2(4 * t + 3) & 0xFF) << 24)
      val ht = Integer.bitCount(s1 ^ s2)
      h += ht
      if (h > cap) return false
      if (ht <= 1) {
        if (t < rowT) return false // an earlier table owns this pair
        if (t == rowT) agreedAtRow = true
        agree += 1
      }
      t += 1
    }
    agreedAtRow && agree >= minAgree
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]],
      c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sigKeep", this, classOf[SigKeep].getName)
    nullSafeCodeGen(ctx, ev,
      (a, b, c, _) => s"${ev.value} = $ref.compute($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}
