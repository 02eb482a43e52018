package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Native Catalyst expression for cosine similarity over two
 * `array<double>` columns — the hot-path scalar of the similarity-search
 * operators. A single fused loop with full whole-stage codegen: no
 * intermediate product array, no lambda-variable plumbing, ~3 passes
 * collapsed into 1 vs the `aggregate(zip_with(...))` composition (which
 * allocates a zipped array per row and evaluates lambdas interpreted).
 *
 * (The reference has no function library at all — SURVEY §2.7; this is
 * the Spark-native extension point: custom Expression > UDF.)
 */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<double>, array<double>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType

  // Mismatched lengths or a null element yield NULL — the exact semantics
  // of the zip_with/aggregate fallback (zip_with pads with null and null
  // propagates through the sum), so plans are interchangeable.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0d; var nx = 0d; var ny = 0d
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = $a.getDouble($i);
         |    double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session-extension registration (the public Catalyst extension point):
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * makes `graft_cosine(a, b)` resolvable; callers reach it through
  * `call_function` (VectorOps falls back to the HOF composition when the
  * extension is absent). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable,
          "graft_minhash(pairs, numHashes) needs a literal numHashes")
        val n = children(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_minhash: numHashes must be integral, got $other")
        }
        MinHashSignature(children(0), n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplanes"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "graft_hyperplanes"),
      (children: Seq[Expression]) => {
        require(children.length == 3 && children(1).foldable && children(2).foldable,
          "graft_hyperplanes(v, nPlanes, dims) needs literal nPlanes/dims")
        def asInt(e: Expression): Int = e.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_hyperplanes: expected integral literal, got $other")
        }
        HyperplaneSignature(children(0), asInt(children(1)), asInt(children(2)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_mean"),
      new ExpressionInfo(classOf[VectorMeanAgg].getName, "graft_vec_mean"),
      (children: Seq[Expression]) => VectorMeanAgg(children.head)
        .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (children: Seq[Expression]) => {
        require(children.length == 3 && children(2).foldable,
          "graft_topk(score, id, k) needs a literal k")
        val k = children(2).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_topk: k must be integral, got $other")
        }
        TopKAgg(children(0), children(1), k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_topfreq"),
      new ExpressionInfo(classOf[FreqSketchAgg].getName, "graft_topfreq"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable,
          "graft_topfreq(item, capacity) needs a literal capacity")
        val cap = children(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_topfreq: capacity must be integral, got $other")
        }
        FreqSketchAgg(children(0), cap).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_bottomk"),
      new ExpressionInfo(classOf[BottomKAgg].getName, "graft_bottomk"),
      (children: Seq[Expression]) => {
        require(children.length == 3 && children(2).foldable,
          "graft_bottomk(hash, value, k) needs a literal k")
        val k = children(2).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_bottomk: k must be integral, got $other")
        }
        BottomKAgg(children(0), children(1), k).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hll"),
      new ExpressionInfo(classOf[HllSketchAgg].getName, "graft_hll"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable,
          "graft_hll(item, p) needs a literal p")
        val p = children(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_hll: p must be integral, got $other")
        }
        HllSketchAgg(children(0), p).toAggregateExpression()
      }))
    // Spark ships BloomFilterAggregate / BloomFilterMightContain for its
    // own runtime-filter injection but leaves them OUT of the function
    // registry; exposing them makes the two-phase decontamination
    // prefilter (TextOps.decontaminateBloom) expressible without a UDF —
    // bloom build is one aggregation, the membership probe stays inside
    // whole-stage codegen.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_bloom_agg(hash, estimatedItems, numBits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2)).toAggregateExpression()
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_might_contain(bloom, hash)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))
      }))
  }
}

object GraftExtensions {
  val configValue: String = classOf[GraftExtensions].getName

  /** True when this session was built with the graft extension. */
  def loadedIn(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption("spark.sql.extensions").exists(_.contains("GraftExtensions"))
}
