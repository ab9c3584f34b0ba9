package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a shingle array as ONE native expression —
  * `numHashes` seeded xxhash64 minima in a tight primitive loop,
  * replacing the interpreted
  * `transform(sequence(0, n-1), i => array_min(transform(sh, s => xxhash64(i, s))))`
  * nest (higher-order functions are CodegenFallback: numHashes × |sh|
  * hash evaluations ride interpreted lambda plumbing).
  *
  * Measured honestly: dd3 is join/verify-dominated at local scales —
  * 0.69 → 0.64 s sf0.1, 3.20 → 3.10 s at 10× (3-run medians), a wash
  * within noise. Kept because the signature pass is the SCAN-side
  * cost that grows with the corpus while banding/verify grow with the
  * candidate set, the expression is parity-locked bit-identical, and
  * it frees the per-element boxing the similarity family already
  * eliminated with DotSeq.
  *
  * Bit-compatibility contract with the HOF formulation it replaces
  * (locked by DedupSpec/PipelineSpec parity tests and the dd3 gate):
  *  - per (i, s): hash chain = XXH64.hashInt(i, 42) then
  *    hashUTF8String(s, ·) — exactly Spark's xxhash64(i, s) with the
  *    default seed 42 and children hashed in order;
  *  - a NULL shingle is skipped by Spark's hash chain, leaving the
  *    seed-stage value — mirrored here;
  *  - an EMPTY shingle array yields `array_min([])` = NULL per slot —
  *    mirrored as an all-null signature array.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(in: Any): Any =
    MinHashSig.sig(in.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.expr.MinHashSig$$.MODULE$$.sig($a, $numHashes);
    """)

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)
}

object MinHashSig {

  /** Shared by interpreted eval and generated code. */
  def sig(sh: ArrayData, numHashes: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val strs = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      strs(j) = if (sh.isNullAt(j)) null else sh.getUTF8String(j)
      j += 1
    }
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val seeded = XXH64.hashInt(i, 42L)
      var m = Long.MaxValue
      var first = true
      var k = 0
      while (k < n) {
        val s = strs(k)
        val h = if (s == null) seeded else XXH64.hashUTF8String(s, seeded)
        if (first || h < m) { m = h; first = false }
        k += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level wrapper. */
  def sigCol(sh: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(sh), numHashes))
}
