package graft

import org.scalatest.funsuite.AnyFunSuite

/** The spec HyperLogLog.scala and HllOracle.scala cite (ADVICE r11 #2):
  * pins the linear-counting ln branch's ROUNDED portability between the
  * JVM (`Math.round(4096 * Math.log(4096.0 / V))`) and DuckDB
  * (`floor(4096 * ln(4096.0 / V) + 0.5)`) for every zero-register count
  * V in 1..4096.
  *
  * Math.log is a JVM intrinsic allowed to differ from StrictMath.log
  * (fdlibm) by 1 ulp, and DuckDB's libm `ln` may sit anywhere in that
  * neighborhood too — so agreement-by-example on one host is not a
  * portability proof. This spec proves it analytically instead:
  *
  *  1. Math.log and StrictMath.log produce the same ROUNDED estimate
  *     for every V (catches an intrinsic drift on this JVM), and
  *  2. for every V, `4096 * log(4096/V)` sits at least 1e-5 away from
  *     every `k + 0.5` rounding boundary — while a 1-ulp log
  *     difference perturbs the scaled value by at most ~1e-11
  *     (|4096 * log| <= 34100; 1 ulp of the log result <= 2^-45 here,
  *     scaled < 1.2e-10). Any libm within 1 ulp of fdlibm therefore
  *     rounds every V identically: margin >> worst-case perturbation.
  *
  * (The concrete DuckDB check was also run out-of-band on this host —
  * 0 mismatches across all 4096 values — but the margin argument is
  * what makes the claim portable to JVMs/libms we have not run.)
  */
class HllOracleSpec extends AnyFunSuite {
  private val M = 4096

  test("ln branch: Math vs StrictMath round-identical for all V") {
    for (v <- 1 to M) {
      val a = Math.round(M * Math.log(M.toDouble / v))
      val b = Math.floor(M * StrictMath.log(M.toDouble / v) + 0.5).toLong
      assert(a == b, s"V=$v: intrinsic $a != fdlibm $b")
    }
  }

  test("ln branch: every V clears the .5 boundary by >= 1e-5 " +
      "(1-ulp libm drift perturbs by < 1.2e-10 — rounding is stable)") {
    var minMargin = Double.MaxValue
    for (v <- 1 to M) {
      val y = M * StrictMath.log(M.toDouble / v)
      val frac = y - Math.floor(y)
      val margin = Math.abs(frac - 0.5)
      if (margin < minMargin) minMargin = margin
      assert(margin >= 1e-5, s"V=$v sits $margin from a .5 boundary")
    }
    info(f"min boundary margin across V=1..4096: $minMargin%.3e")
  }
}
