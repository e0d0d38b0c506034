package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType}

/** Native codegen'd cosine similarity between two numeric arrays.
  *
  * Exactly the semantics of the higher-order-function form in
  * `Functions.cosine` — float elements widened to double, strict
  * left-to-right accumulation starting at 0.0, `dot / (sqrt(na) *
  * sqrt(nb))` — so results are bit-identical to both the HOF fold and
  * DuckDB's `list_reduce`, and any query can swap between them without
  * oracle drift.
  *
  * Why an Expression and not the HOF: `aggregate`/`zip_with` evaluate
  * one interpreted lambda call per element and allocate intermediate
  * arrays per row; this compiles to a single fused primitive loop
  * inside whole-stage codegen, which is the difference between
  * similarity scoring being scan-bound and lambda-bound at 100 TB.
  * (Preference order per the project brief: compose built-ins if
  * possible; custom codegen Expression when the built-in form leaves
  * 10× on the table; custom physical operator only for whole-plan
  * semantics.)
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - cosine similarity of two numeric arrays " +
    "(float or double elements), computed in double precision.")
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float>/array<double>, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  /** Result is null on length mismatch or any null element — exactly
    * the HOF fold's behavior (`zip_with` pads the shorter array with
    * nulls and null arithmetic propagates), so the bit-parity contract
    * with `Functions.cosine` holds on ALL inputs, not just clean ones. */
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def mayHaveNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    val lcn = mayHaveNullElems(left)
    val rcn = mayHaveNullElems(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if ((lcn && x.isNullAt(i)) || (rcn && y.isNullAt(i))) return null
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val lNullCheck =
        if (mayHaveNullElems(left)) s"$a.isNullAt($i)" else "false"
      val rNullCheck =
        if (mayHaveNullElems(right)) s"$b.isNullAt($i)" else "false"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($lNullCheck || $rNullCheck) { ${ev.isNull} = true; break; }
         |    double $xi = (double) $a.$lGet($i);
         |    double $yi = (double) $b.$rGet($i);
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot /
         |      (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
