package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Hash-set membership of a string value in a compile-time literal key
  * set: ONE O(1) probe per evaluation, independent of the set's size.
  *
  * This is the dispatch primitive for batch-applied rewrite rules (see
  * graft.ext.Bpe.applyMerges): the declarative alternative — an OR-chain
  * of `pend === a && s === b` terms — costs O(batch) comparisons per
  * symbol and at production batch sizes (256 merges/scan) builds a
  * 256-way disjunction inside a higher-order-function lambda, an
  * expression-tree size risk on top of the linear work. A literal-array
  * `array_contains` or a literal-map `element_at` would flatten the tree
  * but still probe linearly (ArrayBasedMapData lookup is a scan). The
  * keys here live in a shared `HashSet[UTF8String]` built once per
  * expression instance — no per-row allocation, no string decoding.
  *
  * Both eval paths share the set: interpreted eval probes it directly
  * (higher-order-function lambdas are interpreted, so this is the hot
  * path inside `aggregate(...)` folds), and generated code references the
  * same object via `addReferenceObj`.
  */
case class InLiteralSet(child: Expression, keys: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(8, keys.size * 2))
    keys.foreach(k => s.add(UTF8String.fromString(k)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    set.contains(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("keySet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"$ref.contains($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): InLiteralSet =
    copy(child = newChild)
}
