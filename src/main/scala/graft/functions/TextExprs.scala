package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the sketch-heavy text operators. These are
  * `CodegenFallback` (one virtual call per ROW — the per-element inner
  * loops below dominate, so codegen of the outer shell buys nothing),
  * replacing interpreted higher-order-function chains that paid lambda
  * + UTF8String allocation costs per ELEMENT. Semantics are identical
  * to the HOF formulations they replace, so the DuckDB oracles are
  * unchanged.
  */
object TextExprs {
  private val hexDigits = "0123456789abcdef".toCharArray

  private[functions] def md5ThreadLocal: MessageDigest =
    digests.get()
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private[functions] def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned lexicographic compare of equal-length byte arrays —
    * the same order as comparing their lowercase-hex renderings. */
  private[functions] def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Shared type check for the array<string> → sketch expressions. */
  private[functions] def requireStringArray(
      name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<string>, got $other")
  }

  def minhashSigs(shingles: Column, nSeeds: Int): Column =
    GraftSqlBridge.column(
      MinHashMd5Sigs(GraftSqlBridge.expression(shingles), nSeeds))

  def simhash64(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens)))

  def simhashMd5(tokens: Column): Column =
    GraftSqlBridge.column(SimHashMd5(GraftSqlBridge.expression(tokens)))

  def minShingleMd5(text: Column, shingleLen: Int): Column =
    GraftSqlBridge.column(
      MinShingleMd5(GraftSqlBridge.expression(text), shingleLen))

  def jaccard(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaccardSim(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** MinHash signature: for seed s in [0, nSeeds), the lexicographic
  * minimum of `md5("<s>|<shingle>")` over the shingle set — exactly
  * `transform(sequence(0, n-1), s -> array_min(transform(sh, x ->
  * md5(concat(s, '|', x)))))`, one digest reuse and zero intermediate
  * arrays instead of nSeeds × |sh| UTF8String allocations. */
case class MinHashMd5Sigs(child: Expression, nSeeds: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprs.requireStringArray(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true // null for empty shingle sets
  override def prettyName: String = "minhash_md5_sigs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = TextExprs.md5ThreadLocal
    val mins = new Array[Array[Byte]](nSeeds)
    val seedPrefixes = Array.tabulate(nSeeds)(s =>
      (s.toString + "|").getBytes(StandardCharsets.UTF_8))
    var i = 0
    var seen = false
    while (i < arr.numElements()) {
      // skip null elements, matching array_min's null handling in the
      // HOF formulation this replaces
      if (!arr.isNullAt(i)) {
        seen = true
        val sh = arr.getUTF8String(i).getBytes
        var s = 0
        while (s < nSeeds) {
          md.reset()
          md.update(seedPrefixes(s))
          md.update(sh)
          val h = md.digest()
          if (mins(s) == null || TextExprs.lessThan(h, mins(s))) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    // no non-null shingles → no signature (array_min over empty = null)
    if (!seen) null
    else new GenericArrayData(mins.map(m =>
      UTF8String.fromString(TextExprs.toHex(m))))
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashMd5Sigs = copy(child = newChild)
}

/** 64-bit SimHash over a token array: bit j of the result is set when
  * the sum over tokens of `((xxhash64(token) >> j) & 1) * 2 - 1` is
  * positive — the classic sign-of-weighted-sum sketch, one hash per
  * token instead of 64 interpreted aggregates per document. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprs.requireStringArray(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      // null tokens contribute nothing to the sketch
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        // same xxhash64(seed=42) Spark's SQL function computes
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(t, StringType, 42L)
        var j = 0
        while (j < 64) {
          counts(j) += (((h >>> j) & 1L).toInt * 2) - 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

/** ENGINE-PORTABLE 64-bit SimHash: identical sign-of-weighted-sum
  * construction to [[SimHash64]], but the per-token hash is the first
  * 8 bytes of md5(token) read big-endian instead of xxhash64 — md5 is
  * the one hash both Spark and DuckDB expose bit-identically (the
  * MinHash tier's choice, MinHashMd5Sigs above), which is what lets
  * the SimHash recall certificate (q297) be hash-checked end-to-end:
  * bit j of the hex rendering lives in nibble `15 - j/4` (0-based
  * from the left) at in-nibble position `j % 4`, exactly the
  * arithmetic the oracle mirrors. xxhash64 stays the production
  * default (q26) — one 64-bit mix vs a full digest per token — this
  * variant exists so the certificate's pair set is oracle-derivable. */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExprs.requireStringArray(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val md = TextExprs.md5ThreadLocal
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val h0 = md.digest(arr.getUTF8String(i).getBytes)
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (h0(b) & 0xffL); b += 1 }
        var j = 0
        while (j < 64) {
          counts(j) += (((h >>> j) & 1L).toInt * 2) - 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHashMd5 = copy(child = newChild)
}

/** Set Jaccard similarity of two string arrays in ONE pass —
  * bit-identical to `size(array_intersect(a, b)) /
  * size(array_union(a, b))` cast to double (both counts are exact
  * integers, so the single division is the only float op), without
  * materializing either intermediate array: the HOF composite builds
  * two full result arrays per PAIR on the dedup verify path, which is
  * the hot inner loop of every banded candidate join (q25/q68/q122/
  * q158 consumers). Duplicate elements dedupe exactly as
  * array_intersect/array_union do, and a null ELEMENT counts as one
  * distinguished set member (in the intersection only when both sides
  * hold one) — matching the SQL functions' null semantics. */
case class JaccardSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, array<string>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[UTF8String](aa.numElements() * 2)
    var nullA = false
    var i = 0
    while (i < aa.numElements()) {
      if (aa.isNullAt(i)) nullA = true
      else setA.add(aa.getUTF8String(i))
      i += 1
    }
    // distinct B elements: intersection members vs union-only members
    val seenB = new java.util.HashSet[UTF8String](bb.numElements() * 2)
    var nullB = false
    var inter = 0L
    var bOnly = 0L
    i = 0
    while (i < bb.numElements()) {
      if (bb.isNullAt(i)) nullB = true
      else {
        val e = bb.getUTF8String(i)
        if (seenB.add(e)) {
          if (setA.contains(e)) inter += 1 else bOnly += 1
        }
      }
      i += 1
    }
    if (nullA && nullB) inter += 1
    val union = setA.size.toLong + bOnly +
      (if (nullA || nullB) 1L else 0L)
    inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

/** Minimum md5 over all character shingles of length `shingleLen` —
  * `array_min(transform(sequence(1, length(s)-L+1), i -> md5(substring(
  * s, i, L))))` without materializing the shingle array. Operates on
  * characters (like SQL substring), so it matches the oracle on any
  * input, not just ASCII. */
case class MinShingleMd5(child: Expression, shingleLen: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got $other")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // null when shorter than a shingle
  override def prettyName: String = "min_shingle_md5"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // shingle over CODE POINTS, matching SQL substring/length semantics
    // (UTF-16 substrings would miscount and could split surrogate
    // pairs on supplementary-plane characters)
    val cps = s.codePoints().toArray
    if (cps.length < shingleLen) return null
    val md = TextExprs.md5ThreadLocal
    var min: Array[Byte] = null
    var i = 0
    while (i <= cps.length - shingleLen) {
      md.reset()
      md.update(new String(cps, i, shingleLen)
        .getBytes(StandardCharsets.UTF_8))
      val h = md.digest()
      if (min == null || TextExprs.lessThan(h, min)) min = h
      i += 1
    }
    UTF8String.fromString(TextExprs.toHex(min))
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinShingleMd5 = copy(child = newChild)
}
