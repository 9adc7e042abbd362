package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns as pure
  * Column expressions (higher-order functions, codegen'd — no UDF
  * serialization in the hot path).
  *
  * All arithmetic is done in double after an explicit float→double cast
  * (exact), with sequential left-fold accumulation — deterministic and
  * reproducible in any engine, so results can be oracle-checked.
  */
object VectorFunctions {

  /** Exact float→double element cast. */
  def vec64(a: Column): Column = transform(a, x => x.cast("double"))

  /** Sequential-fold dot product (inputs must be double arrays).
    * Backed by the codegen'd [[CodegenExpressions.DotProductExpr]] — same
    * accumulation order (and therefore bit-identical doubles) as the
    * equivalent `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, but ~400×
    * cheaper per evaluation (compiled loop vs interpreted lambda). */
  def dot(a: Column, b: Column): Column = CodegenExpressions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sign-random-projection LSH (no materialized hyperplanes): plane j's
    * i-th component is ±1 derived from xxhash64(j, i) — deterministic
    * across runs/cluster layouts, any embedding dimension. Vectors sharing
    * a bucket id are cosine-similar candidates (P[a hyperplane separates
    * two vectors] = angle/π).
    *
    * Multi-table (OR-amplified): `nTables` independent bucket ids,
    * each tagged with its table index in the high bits. A pair is a
    * candidate if it collides in ANY table — recall 1-(1-p^bits)^tables,
    * tunable independently of the per-table selectivity. Explode the
    * returned array and equijoin on the bucket value. Compiled kernel with
    * hashing identical to the HOF formulation above (see
    * [[CodegenExpressions.LshBucketsExpr]]). */
  def lshBuckets(emb: Column, nTables: Int, bitsPerTable: Int): Column =
    CodegenExpressions.lshBucketsCol(emb, nTables, bitsPerTable)
}
