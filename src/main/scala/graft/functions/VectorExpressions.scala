package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the embedding dot product — the one
  * hot loop where the built-in composition
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is measurably wasteful:
  * zip_with materializes an intermediate array per row and the fold
  * walks it back through generic getters. This expression runs one
  * fused primitive loop, with `doGenCode` emitting straight Java
  * inside WholeStageCodegen (SURVEY.md §7.3 custom-path (b): a scalar
  * Expression, not a plan rule — built-ins express the semantics,
  * this is purely the codegen'd fast path).
  *
  * Semantics (incl. IEEE accumulation order: sequential left fold,
  * NULL if either side or any element is NULL) match the higher-order
  * form exactly — proved in VectorExpressionsSpec. At 100 TB the ANN
  * scoring join is compute-bound on exactly this loop.
  *
  * Registered through the public [[SparkSessionExtensions]] hook
  * ([[GraftExtensions]], `spark.sql.extensions`) as `dot_native`.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_native expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // Length mismatch → NULL, exactly like the higher-order form:
    // zip_with null-pads the shorter side, the padded product is NULL,
    // and the fold propagates it. (Truncating to min length here would
    // silently diverge from `Similarity.dot` on ragged input.)
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var i = 0
    var acc = 0.0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($x.numElements() != $y.numElements()) { ${ev.isNull} = true; }
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; !${ev.isNull} && $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native 60-bit SimHash signature over an `array<long>` of token
  * hashes — the dedup hot loop where the built-in composition
  * (`aggregate(sequence(0,59), …)` with an inner `aggregate(hashes)`
  * per bit) re-walks the token array 60× per document through
  * interpreted higher-order lambdas. This expression makes one pass:
  * a primitive `long[60]` vote counter updated per element, then the
  * sign fold into the signature.
  *
  * Semantics match `Dedup.simhash` (the HOF form) exactly, including
  * its null-element behavior: a NULL token hash votes −1 on every bit
  * (the HOF's `when(NULL…)` falls to the otherwise branch). NULL array
  * → NULL. Proved equal in VectorExpressionsSpec.
  *
  * Reference context: the SimHash family extends the reference's
  * dedup-free pipeline for LLM training data (builder brief); the
  * banding/verify machinery lives in graft.llm.Dedup.
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash_native expects array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  private val Bits = 60

  override protected def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val votes = new Array[Long](Bits)
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) {
        var j = 0
        while (j < Bits) { votes(j) -= 1L; j += 1 }
      } else {
        val h = xs.getLong(i)
        var j = 0
        while (j < Bits) { votes(j) += ((h >>> j) & 1L) * 2L - 1L; j += 1 }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < Bits) { if (votes(j) > 0L) sig |= 1L << j; j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $votes = new long[$Bits];
         |for (int $i = 0; $i < $x.numElements(); $i++) {
         |  if ($x.isNullAt($i)) {
         |    for (int $j = 0; $j < $Bits; $j++) $votes[$j] -= 1L;
         |  } else {
         |    long $h = $x.getLong($i);
         |    for (int $j = 0; $j < $Bits; $j++) $votes[$j] += (($h >>> $j) & 1L) * 2L - 1L;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < $Bits; $j++) if ($votes[$j] > 0L) $sig |= 1L << $j;
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Engine extensions — wire with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_native"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_native"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_native takes exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_native"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash_native"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash_native takes exactly 1 argument")
        SimHash(children.head)
      }))
  }
}
