package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/**
 * Native Catalyst expression for the MinHash signature — the hot loop of
 * the near-dup pipeline: given the per-shingle `(h1, h2)` hash pairs
 * (Kirsch–Mitzenmacher double hashing, see TextOps.hashPairs), compute
 * `sig[i] = min_j ((h1_j + i·h2_j) mod p)` for i < numHashes, p = 2³¹−1.
 * The mod is load-bearing — unreduced, the affine family's argmin
 * follows a lower envelope of lines and the 128 positions collapse to a
 * few effective draws (see TextOps.signatureFromPairs).
 *
 * The HOF composition (`transform(sequence(...), i => array_min(
 * transform(pairs, ...)))`) evaluates interpreted lambdas and allocates
 * an intermediate array per (row, hash function) — numHashes·|shingles|
 * lambda frames per document. This is one fused loop per row, inside
 * whole-stage codegen, that loads each pair once and walks the hash
 * family by repeated addition (no multiply in the inner loop).
 *
 * Value-identical to the HOF form for non-empty inputs. For an EMPTY
 * shingle set the HOF form produced an array of null minimums (every
 * sub-3-token doc then collided in every LSH bucket — quadratic candidate
 * noise that the exact-verify stage had to filter); this returns NULL, so
 * empty docs simply never enter the banded join.
 */
object MinHashSignature {
  /** The KM modulus (TextOps.MinHashP) — single source for both paths. */
  val P: Long = 2147483647L
}

case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
      if s.fields.length == 2 && s.fields.forall(_.dataType == LongType) =>
      if (numHashes > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("graft_minhash: numHashes must be > 0")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<struct<long, long>>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val pairs = input.asInstanceOf[ArrayData]
    val n = pairs.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var contributed = false
    var j = 0
    while (j < n) {
      // hashPairs never emits null elements, but direct SQL use of
      // graft_minhash may: skip them like absent shingles instead of NPEing
      if (!pairs.isNullAt(j)) {
        contributed = true
        val r = pairs.getStruct(j, 2)
        val h2 = r.getLong(1)
        // incremental modular walk: v stays < p, v + h2 < p + 2³² — no
        // overflow, and reducing per step equals reducing h1 + i·h2 once
        var v = r.getLong(0) % MinHashSignature.P
        var i = 0
        while (i < numHashes) {
          if (v < sig(i)) sig(i) = v
          v = (v + h2) % MinHashSignature.P
          i += 1
        }
      }
      j += 1
    }
    if (!contributed) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p => {
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val row = ctx.freshName("row"); val v = ctx.freshName("v"); val h2 = ctx.freshName("h2")
      val contributed = ctx.freshName("contributed")
      s"""
         |int $n = $p.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |boolean $contributed = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($p.isNullAt($j)) continue;  // null element from direct SQL use
         |  $contributed = true;
         |  InternalRow $row = $p.getStruct($j, 2);
         |  long $v = $row.getLong(0) % ${MinHashSignature.P}L;
         |  long $h2 = $row.getLong(1);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    if ($v < $sig[$i]) $sig[$i] = $v;
         |    $v = ($v + $h2) % ${MinHashSignature.P}L;
         |  }
         |}
         |if (!$contributed) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
