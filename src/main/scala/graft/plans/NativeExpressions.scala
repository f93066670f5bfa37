package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The composable `VectorFunctions.cosineSimilarity` (zip_with + aggregate)
  * is semantically right but higher-order lambdas are interpreted per
  * element, which dominates brute-force similarity search cost. This
  * expression computes the same value in one tight codegen'd loop —
  * identical arithmetic order (sequential left-to-right double
  * accumulation), so results are bit-for-bit equal to the HOF form and to
  * the DuckDB oracle's sequential list_sum.
  *
  * This is the (b) tier of the extension preference order (compose
  * built-ins > custom Expression > custom plan node): built-ins express the
  * semantics but not the performance.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with Serializable {

  // ExpectsInputTypes is off-limits outside the sql package
  // (AbstractDataType is private[sql]); validate manually instead.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity_native expects two array<float> inputs, got $l and $r"
        )
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity_native"
}

/** Squared Euclidean distance between two `array<float>` vectors in one
  * codegen'd loop — same rationale and arithmetic contract as
  * [[CosineSimilarityExpr]] (sequential double accumulation, bit-identical
  * to the HOF `VectorFunctions.squaredDistance` and to a DuckDB
  * `list_sum(list_transform(...))` fold). Hot path: IVF cell assignment
  * evaluates one of these per centroid per corpus row. */
case class SquaredDistanceExpr(left: Expression, right: Expression)
    extends BinaryExpression
    with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"squared_distance_native expects two array<float> inputs, got $l and $r"
        )
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "squared_distance_native"
}

/** Sign-bit hyperplane LSH bucket in one codegen'd pass: bit p of the
  * result is set iff `v . planes(p) > 0`. The HOF form evaluates one
  * interpreted zip_with+aggregate lambda chain PER PLANE per row (a bank
  * of 3 planes over 16 banks = 48 interpreted folds per row in the
  * multi-band dedup path); this expression runs all planes in one tight
  * loop nest with the plane matrix held as a constant reference object.
  * Arithmetic contract: per plane, sequential left-to-right double
  * accumulation over min(|v|, |plane|) elements, `> 0` sign test —
  * bit-identical to `VectorFunctions.hyperplaneBucketHof` and to the
  * DuckDB oracle's CASE WHEN fold. */
case class HyperplaneBucketExpr(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression
    with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bucket_native expects an array<float> input, got $t"
        )
    }

  override def dataType: DataType = IntegerType

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var bucket = 0
    var p = 0
    while (p < planeArr.length) {
      val plane = planeArr(p)
      val n = math.min(v.numElements(), plane.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getFloat(i).toDouble * plane(i)
        i += 1
      }
      if (acc > 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planeArr, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val plane = ctx.freshName("plane")
      s"""
         |int $bucket = 0;
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  double[] $plane = $planesRef[$p];
         |  int $n = java.lang.Math.min($v.numElements(), $plane.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $v.getFloat($i) * $plane[$i];
         |  }
         |  if ($acc > 0) $bucket |= (1 << $p);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_bucket_native"
}
