package graft.text

/** Python `repr(float)` — the shortest round-trip decimal with
  * CPython's formatting rules: positional for decimal exponents in
  * [-4, 16), scientific (`1.23e+16` / `5e-05`, two-digit signed
  * exponent, no trailing `.0` on a bare mantissa digit) outside.
  * Digits come from a shortest-round-trip search (correctly-rounded
  * k-significant-digit decimals of the EXACT binary value, smallest k
  * that parses back) — Java 17's legacy `Double.toString` is NOT
  * always shortest (1e23 → "9.999999999999999E22", JDK-4511638), so
  * it cannot be the source. Used wherever the reference interpolates
  * a raw float (`str(x)`, `json.dumps`).
  */
object PyFloat {

  def repr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    if (d == 0.0) return if (1 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val a = math.abs(d)
    val exact = new java.math.BigDecimal(a)
    var k = 1
    var rounded = exact
    var found = false
    while (!found && k <= 17) {
      val r = exact.round(new java.math.MathContext(k, java.math.RoundingMode.HALF_EVEN))
      if (r.doubleValue() == a) { rounded = r; found = true } else k += 1
    }
    if (!found) rounded = exact.round(new java.math.MathContext(17, java.math.RoundingMode.HALF_EVEN))
    var digits = rounded.unscaledValue().abs().toString
    var e10 = (digits.length - 1) - rounded.scale()
    digits = digits.reverse.dropWhile(_ == '0').reverse
    if (digits.isEmpty) digits = "0"
    val sign = if (neg) "-" else ""
    if (e10 >= 16 || e10 < -4) {
      val m = if (digits.length == 1) digits else s"${digits.head}.${digits.tail}"
      val es = if (e10 < 0) f"-${-e10}%02d" else f"+$e10%02d"
      s"$sign${m}e$es"
    } else if (e10 >= 0) {
      if (digits.length > e10 + 1) s"$sign${digits.take(e10 + 1)}.${digits.drop(e10 + 1)}"
      else sign + digits.padTo(e10 + 1, '0').mkString + ".0"
    } else {
      sign + "0." + "0" * (-e10 - 1) + digits
    }
  }
}
