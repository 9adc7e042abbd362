package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot vector/text kernels.
  *
  * Both implement `doGenCode`, so they participate in whole-stage codegen
  * (one virtual call into [[VectorKernels]] per row) instead of falling
  * back to interpreted per-element lambda evaluation like Spark's
  * higher-order functions. See VectorKernels for the measured why.
  */
object CodegenExpressions {

  private def requireType(e: Expression, t: DataType, who: String): TypeCheckResult =
    if (DataType.equalsIgnoreNullability(e.dataType, t)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$who expects ${t.simpleString}, got ${e.dataType.simpleString}")

  /** Codegen'd dot product over two array<double> columns. */
  final case class DotProductExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireType(left, ArrayType(DoubleType), "dot_product")
      if (l != TypeCheckResult.TypeCheckSuccess) l
      else requireType(right, ArrayType(DoubleType), "dot_product")
    }
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorKernels.dot($a, $b);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProductExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Codegen'd distinct n-gram shingles over an array<string> token column. */
  final case class ShinglesExpr(child: Expression, n: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, ArrayType(StringType), "shingles")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(arr: Any): Any =
      VectorKernels.shingles(arr.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorKernels.shingles($a, $n);")
    override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
      copy(child = newChild)
  }

  /** Codegen'd one-pass MinHash signature over an array<string> column. */
  final case class MinHashSigExpr(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, ArrayType(StringType), "minhash_sig")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(arr: Any): Any =
      VectorKernels.minhash(arr.asInstanceOf[ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorKernels.minhash($a, $numHashes);")
    override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
      copy(child = newChild)
  }

  /** Codegen'd winnowing fingerprint selection over an array<string>
    * token column: packed (40-bit md5 gram hash)·2^20 + pos, windowed
    * minima, first-occurrence dedup — see [[VectorKernels.winnowPacked]]
    * for the value-identity argument vs the HOF formulation. */
  final case class WinnowPackExpr(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    // Rejects containsNull=true outright (round 16, ADVICE r15 #5): the
    // kernel reads each element without an isNullAt check, so a nullable
    // array could diverge from the HOF's concat_ws null-skip. The only
    // producer is split(), whose output never contains nulls.
    override def checkInputDataTypes(): TypeCheckResult = {
      val base = requireType(child, ArrayType(StringType), "winnow_pack")
      if (base != TypeCheckResult.TypeCheckSuccess) base
      else child.dataType match {
        case ArrayType(_, true) => TypeCheckResult.TypeCheckFailure(
          "winnow_pack expects array<string> with containsNull=false")
        case _ => TypeCheckResult.TypeCheckSuccess
      }
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(arr: Any): Any =
      VectorKernels.winnowPacked(arr.asInstanceOf[ArrayData], k, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorKernels.winnowPacked($a, $k, $w);")
    override protected def withNewChildInternal(newChild: Expression): WinnowPackExpr =
      copy(child = newChild)
  }

  /** Codegen'd 64-bit SimHash over an array<string> token column. */
  final case class SimHashExpr(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, ArrayType(StringType), "simhash64")
    override def dataType: DataType = LongType
    override protected def nullSafeEval(arr: Any): Any =
      VectorKernels.simhash(arr.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorKernels.simhash($a);")
    override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
      copy(child = newChild)
  }

  def simhashCol(toks: Column): Column =
    GraftColumnBridge.column(SimHashExpr(GraftColumnBridge.expression(toks)))

  /** Codegen'd char-n-gram language classification over a string column. */
  final case class LangIdExpr(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, StringType, "lang_id")
    override def dataType: DataType = StringType
    override protected def nullSafeEval(s: Any): Any =
      VectorKernels.langId(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.VectorKernels.langId($s);")
    override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
      copy(child = newChild)
  }

  def langIdCol(text: Column): Column =
    GraftColumnBridge.column(LangIdExpr(GraftColumnBridge.expression(text)))

  /** Codegen'd rolling-hash document fingerprint over a string column. */
  final case class FingerprintExpr(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, StringType, "fingerprint")
    override def dataType: DataType = LongType
    override protected def nullSafeEval(s: Any): Any =
      VectorKernels.rollingFingerprint(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.VectorKernels.rollingFingerprint($s);")
    override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
      copy(child = newChild)
  }

  /** Codegen'd multi-table sign-LSH bucket ids over an array<double> column. */
  final case class LshBucketsExpr(child: Expression, nTables: Int, bitsPerTable: Int)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, ArrayType(DoubleType), "lsh_buckets")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(arr: Any): Any =
      VectorKernels.lshBuckets(arr.asInstanceOf[ArrayData], nTables, bitsPerTable)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorKernels.lshBuckets($a, $nTables, $bitsPerTable);")
    override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
      copy(child = newChild)
  }

  /** Codegen'd bloom-filter membership test over a string column.
    *
    * The serialized filter (`org.apache.spark.util.sketch.BloomFilter`
    * stream format, as produced by `df.stat.bloomFilter`) rides in the
    * expression and is deserialized once per executor instance, not per
    * row; codegen references the live filter object directly
    * (`ctx.addReferenceObj`), so the per-row cost is one hash probe.
    * Membership is tested on the UTF-8 bytes — identical to what
    * `stat.bloomFilter` inserts for string columns — and `null` input
    * yields `null` (standard null-safe expression semantics); callers
    * that need anti-join null parity must route null keys explicitly
    * (see [[graft.operators.BloomFront]]).
    */
  final case class BloomMightContainExpr(child: Expression, bloomBytes: Array[Byte])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      requireType(child, StringType, "bloom_might_contain")
    override def dataType: DataType = BooleanType
    @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes))
    override protected def nullSafeEval(s: Any): Any =
      bloom.mightContainBinary(
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomFilter", bloom,
        classOf[org.apache.spark.util.sketch.BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.mightContainBinary($s.getBytes());")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
      copy(child = newChild)
  }

  def bloomMightContain(key: Column, bloomBytes: Array[Byte]): Column =
    GraftColumnBridge.column(BloomMightContainExpr(
      GraftColumnBridge.expression(key), bloomBytes))

  def fingerprintCol(text: Column): Column =
    GraftColumnBridge.column(FingerprintExpr(GraftColumnBridge.expression(text)))

  def lshBucketsCol(emb: Column, nTables: Int, bitsPerTable: Int): Column =
    GraftColumnBridge.column(LshBucketsExpr(
      GraftColumnBridge.expression(emb), nTables, bitsPerTable))

  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def minhashSig(shingles: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSigExpr(
      GraftColumnBridge.expression(shingles), numHashes))

  def shingleArr(toks: Column, n: Int): Column =
    GraftColumnBridge.column(ShinglesExpr(GraftColumnBridge.expression(toks), n))

  def winnowPack(toks: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(WinnowPackExpr(
      GraftColumnBridge.expression(toks), k, w))
}
