package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass rolling document fingerprint over an ASCII text column.
  *
  * Semantically identical to the declarative form in
  * [[graft.functions.TextFunctions.fingerprintSpark]] —
  * `aggregate(transform(split(trim(text),' '), tok -> horner8(rpad(tok,8))),
  * 0, (acc,c) -> (acc*1000003 + c) % P)` — but with zero array
  * allocation: one walk over the UTF8 bytes, token boundaries at spaces
  * (consecutive spaces produce empty tokens, as `split` does), each
  * token's code from its first 8 bytes space-padded, Horner base 31,
  * mod P = 2^31-1. ASCII-only texts (multibyte codepoints would diverge
  * from `ascii()` semantics).
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    var lo = 0
    var hi = b.length
    while (lo < hi && b(lo) == ' ') lo += 1
    while (hi > lo && b(hi - 1) == ' ') hi -= 1
    val P = 2147483647L
    var fp = 0L
    var i = lo
    var done = false
    while (!done) {
      var j = i
      while (j < hi && b(j) != ' ') j += 1
      var acc = 0L
      var k = 8
      while (k >= 1) {
        val ch = if (i + k - 1 < j) b(i + k - 1) & 0xff else 32
        acc = ch + 31 * acc
        k -= 1
      }
      fp = (fp * 1000003L + acc % P) % P
      if (j >= hi) done = true else i = j + 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("b")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val fp = ctx.freshName("fp")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val k = ctx.freshName("k")
      val ch = ctx.freshName("ch")
      s"""
         |byte[] $b = $c.getBytes();
         |int $lo = 0; int $hi = $b.length;
         |while ($lo < $hi && $b[$lo] == ' ') $lo++;
         |while ($hi > $lo && $b[$hi - 1] == ' ') $hi--;
         |long $fp = 0L;
         |int $i = $lo;
         |while (true) {
         |  int $j = $i;
         |  while ($j < $hi && $b[$j] != ' ') $j++;
         |  long $acc = 0L;
         |  for (int $k = 8; $k >= 1; $k--) {
         |    int $ch = ($i + $k - 1 < $j) ? ($b[$i + $k - 1] & 0xff) : 32;
         |    $acc = $ch + 31L * $acc;
         |  }
         |  $fp = ($fp * 1000003L + $acc % 2147483647L) % 2147483647L;
         |  if ($j >= $hi) break; else $i = $j + 1;
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
