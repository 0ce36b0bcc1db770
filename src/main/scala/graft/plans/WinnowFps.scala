package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer et al.) in ONE fused pass:
  * n-gram rolling hashes -> packed selection keys
  * `(h mod hmod) * c + (c-1-pos)` -> sliding-window minimum over every
  * full window of `w` keys -> sorted distinct fingerprints
  * (`minkey / c`). The packed key makes the required rightmost-argmin a
  * plain MIN; `pos` is 1-based and must stay below `c`.
  *
  * Declarative twin (what the DuckDB oracle replays, see
  * t25_winnow_overlap): positional Horner hashes + windowed MIN over the
  * packed keys + distinct. This expression exists because the interpreted
  * 13-fold zip_with chain plus the per-position explode and window
  * shuffle measured 10.2 s at sf0.1 — the whole selection is
  * position-local, so none of those rows need to leave the scan.
  *
  * Window minima use the naive O(w) inner loop: w is 8; a monotonic deque
  * would only obscure the arithmetic the oracle must replay.
  *
  * `keepPos = true` (graft_winnow13p) emits the distinct PACKED minkeys
  * instead of `minkey / c`: fp = key div c, selected 1-based gram
  * position = (c-1) - key mod c. t37's position-bounded span confirm
  * needs the selection positions — a shared >=20-char span selects a
  * common fp at the same relative offset in both docs, so the exact
  * 20-gram confirm join only has to look at the w positions behind each
  * shared-fp occurrence instead of gram-exploding whole documents.
  */
case class WinnowFps(child: Expression, n: Int, base: Long, mod: Long,
    w: Int, hmod: Long, c: Long, keepPos: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0 && base > 0 && mod > 0 &&
        w > 0 && hmod > 0 && c > 1 &&
        mod - 1 <= (Long.MaxValue - 255) / base && // Horner can't wrap
        hmod - 1 <= (Long.MaxValue / c))           // packed key can't wrap
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects (string) with positive params, " +
        s"base*(mod-1)+255 < 2^63 and hmod*c < 2^63; got " +
        s"${child.dataType.simpleString}, n=$n, base=$base, mod=$mod, " +
        s"w=$w, hmod=$hmod, c=$c")

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    val cnt = b.length - n + 1
    // position-packing precondition enforced, not assumed: pos (1-based,
    // <= cnt) must stay below c or (c-1-pos) goes negative, silently
    // corrupting rightmost-argmin selection AND making minkey/c diverge
    // from the oracle's floor division. Fail loudly — a 100 TB run wants
    // the document surfaced, not a wrong fingerprint.
    if (cnt >= c) throw new IllegalArgumentException(
      s"graft_winnow: document with ${b.length} bytes exceeds the " +
        s"position-packing capacity (need n-grams < c=$c)")
    val wins = cnt - w + 1
    if (wins <= 0) return new GenericArrayData(Array.emptyLongArray)
    val k = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      var acc = 0L
      var j = 0
      while (j < n) { acc = ((b(i + j) & 0xff) + base * acc) % mod; j += 1 }
      k(i) = (acc % hmod) * c + (c - 1 - (i + 1))
      i += 1
    }
    val f = new Array[Long](wins)
    var s = 0
    while (s < wins) {
      var mn = k(s)
      var t = 1
      while (t < w) { if (k(s + t) < mn) mn = k(s + t); t += 1 }
      f(s) = if (keepPos) mn else mn / c
      s += 1
    }
    java.util.Arrays.sort(f)
    var m = 1
    var r = 1
    while (r < wins) {
      if (f(r) != f(m - 1)) { f(m) = f(r); m += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(f, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, cv => {
      val b = ctx.freshName("b")
      val cnt = ctx.freshName("cnt")
      val wins = ctx.freshName("wins")
      val k = ctx.freshName("k")
      val f = ctx.freshName("f")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val mn = ctx.freshName("mn")
      val m = ctx.freshName("m")
      val r = ctx.freshName("r")
      s"""
         |byte[] $b = $cv.getBytes();
         |int $cnt = $b.length - $n + 1;
         |if ($cnt >= ${c}L) {
         |  throw new IllegalArgumentException(
         |    "graft_winnow: document with " + $b.length + " bytes exceeds " +
         |    "the position-packing capacity (need n-grams < c=" + ${c}L + ")");
         |}
         |int $wins = $cnt - $w + 1;
         |if ($wins <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $k = new long[$cnt];
         |  for (int $i = 0; $i < $cnt; $i++) {
         |    long $acc = 0L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $acc = (($b[$i + $j] & 0xff) + ${base}L * $acc) % ${mod}L;
         |    }
         |    $k[$i] = ($acc % ${hmod}L) * ${c}L + (${c}L - 1L - ($i + 1));
         |  }
         |  long[] $f = new long[$wins];
         |  for (int $s = 0; $s < $wins; $s++) {
         |    long $mn = $k[$s];
         |    for (int $t = 1; $t < $w; $t++) {
         |      if ($k[$s + $t] < $mn) $mn = $k[$s + $t];
         |    }
         |    $f[$s] = ${if (keepPos) s"$mn" else s"$mn / ${c}L"};
         |  }
         |  java.util.Arrays.sort($f);
         |  int $m = 1;
         |  for (int $r = 1; $r < $wins; $r++) {
         |    if ($f[$r] != $f[$m - 1]) { $f[$m] = $f[$r]; $m++; }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($f, $m));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
