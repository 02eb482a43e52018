package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The shared sign-random-projection plane matrix. */
object Hyperplanes {
  /** plane(j)(i) = ±1 from the low bit of md5("j_i")'s first byte —
    * Rademacher entries instead of a JVM-seeded Gaussian draw. ±1
    * projections are a standard LSH family for angular distance (same
    * collision probability 1 − θ/π per bit as the Gaussian form), and
    * md5 is computable bit-identically in DuckDB — which is what lets
    * the ann_lsh / dedup_embedding oracles re-derive the exact plane
    * matrix relationally instead of trusting the engine (a
    * java.util.Random stream has no SQL twin). */
  def matrix(nPlanes: Int, dims: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes) { j =>
      Array.tabulate(dims) { i =>
        val h = md.digest(s"${j}_${i}".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1.0 else -1.0
      }
    }
  }
}

/**
 * Native Catalyst expression for the random-hyperplane LSH signature:
 * bit j = [plane_j · v > 0] over the deterministic md5-derived ±1 plane
 * set (the same [[Hyperplanes.matrix]] that `VectorOps.planes` embeds as
 * a plan literal for the HOF form — bit-identical output).
 *
 * One fused dot-product loop per row in whole-stage codegen, with the
 * plane matrix attached as a codegen reference object — replaces
 * nPlanes × dims interpreted lambda frames per vector AND removes the
 * nPlanes·dims-element literal from the expression tree (the thing that
 * capped plane counts in the plan-literal form).
 *
 * Parity with the HOF form's edge semantics: a dims mismatch fails
 * loudly (the zip_with null-padding degeneracy — every signature
 * collapsing to one bucket — is the documented failure this guards);
 * a null vector element yields bit 0 (the HOF's null dot falls through
 * `when`'s otherwise branch).
 */
case class HyperplaneSignature(child: Expression, nPlanes: Int, dims: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if nPlanes > 0 && dims > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplanes expects array<double> with positive nPlanes/dims, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  /** Same matrix as VectorOps.planes (single source: [[Hyperplanes]]). */
  @transient private lazy val planes: Array[Array[Double]] =
    Hyperplanes.matrix(nPlanes, dims)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dims)
      throw new IllegalArgumentException(
        s"graft_hyperplanes: embedding length ${v.numElements()} != dims=$dims")
    val bits = new Array[Int](nPlanes)
    var j = 0
    while (j < nPlanes) {
      val pj = planes(j)
      var dot = 0d
      var nullSeen = false
      var d = 0
      while (d < dims && !nullSeen) {
        if (v.isNullAt(d)) nullSeen = true
        else dot += v.getDouble(d) * pj(d)
        d += 1
      }
      bits(j) = if (!nullSeen && dot > 0) 1 else 0
      j += 1
    }
    new GenericArrayData(bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val bits = ctx.freshName("bits"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val dot = ctx.freshName("dot")
      val pj = ctx.freshName("pj"); val ns = ctx.freshName("nullSeen")
      s"""
         |if ($v.numElements() != $dims) {
         |  throw new IllegalArgumentException(
         |    "graft_hyperplanes: embedding length " + $v.numElements() + " != dims=" + $dims);
         |}
         |int[] $bits = new int[$nPlanes];
         |for (int $j = 0; $j < $nPlanes; $j++) {
         |  double[] $pj = $planesRef[$j];
         |  double $dot = 0.0;
         |  boolean $ns = false;
         |  for (int $d = 0; $d < $dims && !$ns; $d++) {
         |    if ($v.isNullAt($d)) { $ns = true; }
         |    else { $dot += $v.getDouble($d) * $pj[$d]; }
         |  }
         |  $bits[$j] = (!$ns && $dot > 0.0) ? 1 : 0;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bits);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
