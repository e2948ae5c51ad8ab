package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oceanographic derived quantities — the GSW-toolbox capability the
  * reference bundles (GSW-Python in the reference tree), re-expressed as
  * columnar Spark functions using the published UNESCO PSS-78 / Saunders
  * formulas. Pure scalar arithmetic: codegen'd, shuffle-free, and
  * emitted in an identical shape for the SQL oracle (see
  * [[spFromCSql]]).
  */
object Seawater {

  // PSS-78 constants (UNESCO Technical Papers in Marine Science 44).
  private val A = Seq(0.0080, -0.1692, 25.3851, 14.0941, -7.0261, 2.7081)
  private val B = Seq(0.0005, -0.0056, -0.0066, -0.0375, 0.0636, -0.0144)
  private val C = Seq(0.6766097, 2.00564e-2, 1.104259e-4, -6.9698e-7, 1.0031e-9)
  private val D = Seq(3.426e-2, 4.464e-4, 4.215e-1, -3.107e-3)
  private val E = Seq(2.070e-5, -6.370e-10, 3.989e-15)
  private val K = 0.0162
  /** C(35, 15, 0) in mS/cm. */
  val c35150 = 42.9140

  /** Practical salinity from conductivity (mS/cm), in-situ temperature
    * (°C, IPTS-68) and pressure (dbar) — the PSS-78 equation.
    * Check value: C = 42.9140, T = 15, P = 0 → SP = 35.
    */
  def spFromC(cond: Column, t: Column, p: Column): Column = {
    val r = cond / c35150
    val rt_t = lit(C(0)) + t * C(1) + t * t * C(2) + t * t * t * C(3) + t * t * t * t * C(4)
    val rp = lit(1.0) + (p * (lit(E(0)) + p * E(1) + p * p * E(2))) /
      (lit(1.0) + t * D(0) + t * t * D(1) + (lit(D(2)) + t * D(3)) * r)
    val rt = r / (rp * rt_t)
    val srt = sqrt(rt)
    def poly(cs: Seq[Double]): Column =
      lit(cs(0)) + srt * cs(1) + rt * cs(2) + rt * srt * cs(3) +
        rt * rt * cs(4) + rt * rt * srt * cs(5)
    poly(A) + ((t - 15.0) / (lit(1.0) + (t - 15.0) * K)) * poly(B)
  }

  // EOS-80 one-atmosphere density constants (UNESCO TP 38 / Millero-Poisson).
  private val RW = Seq(999.842594, 6.793952e-2, -9.095290e-3, 1.001685e-4, -1.120083e-6, 6.536332e-9)
  private val RB = Seq(8.24493e-1, -4.0899e-3, 7.6438e-5, -8.2467e-7, 5.3875e-9)
  private val RC = Seq(-5.72466e-3, 1.0227e-4, -1.6546e-6)
  private val RD0 = 4.8314e-4

  /** σ-t: density anomaly ρ(S,T,0) − 1000 kg/m³ (EOS-80 one-atmosphere
    * equation). Check value: ρ(35, 5, 0) = 1027.67547.
    */
  def sigmaT(sp: Column, t: Column): Column = {
    val rhoW = lit(RW(0)) + t * RW(1) + t * t * RW(2) + t * t * t * RW(3) +
      t * t * t * t * RW(4) + t * t * t * t * t * RW(5)
    val bPoly = lit(RB(0)) + t * RB(1) + t * t * RB(2) + t * t * t * RB(3) + t * t * t * t * RB(4)
    val cPoly = lit(RC(0)) + t * RC(1) + t * t * RC(2)
    rhoW + sp * bPoly + sp * sqrt(sp) * cPoly + sp * sp * RD0 - 1000.0
  }

  /** SQL twin of [[sigmaT]], same association order. */
  def sigmaTSql(sp: String, t: String): String = {
    val rhoW = s"(${RW(0)} + ($t) * ${RW(1)} + ($t) * ($t) * ${RW(2)} + ($t) * ($t) * ($t) * ${RW(3)} + " +
      s"($t) * ($t) * ($t) * ($t) * ${RW(4)} + ($t) * ($t) * ($t) * ($t) * ($t) * ${RW(5)})"
    val bPoly = s"(${RB(0)} + ($t) * ${RB(1)} + ($t) * ($t) * ${RB(2)} + " +
      s"($t) * ($t) * ($t) * ${RB(3)} + ($t) * ($t) * ($t) * ($t) * ${RB(4)})"
    val cPoly = s"(${RC(0)} + ($t) * ${RC(1)} + ($t) * ($t) * ${RC(2)})"
    s"($rhoW + ($sp) * $bPoly + ($sp) * SQRT($sp) * $cPoly + ($sp) * ($sp) * $RD0 - 1000.0)"
  }

  /** Speed of sound in seawater, Mackenzie (1981) nine-term equation:
    * T (°C), S (practical salinity), D depth (m). Check value:
    * c(25, 35, 1000) ≈ 1550.744 m/s.
    */
  def soundSpeed(t: Column, s: Column, d: Column): Column =
    lit(1448.96) + t * 4.591 - t * t * 5.304e-2 + t * t * t * 2.374e-4 +
      (s - 35.0) * 1.340 + d * 1.630e-2 + d * d * 1.675e-7 -
      t * (s - 35.0) * 1.025e-2 - t * d * d * d * 7.139e-13

  /** SQL twin of [[soundSpeed]], same association order. */
  def soundSpeedSql(t: String, s: String, d: String): String =
    s"(1448.96 + ($t) * 4.591 - ($t) * ($t) * 5.304e-2 + ($t) * ($t) * ($t) * 2.374e-4 + " +
      s"(($s) - 35.0) * 1.340 + ($d) * 1.630e-2 + ($d) * ($d) * 1.675e-7 - " +
      s"($t) * (($s) - 35.0) * 1.025e-2 - ($t) * ($d) * ($d) * ($d) * 7.139e-13)"

  /** SQL twin of [[spFromC]] — same constants, same association order, so
    * doubles match bit-for-bit. Operands are SQL expression strings.
    */
  def spFromCSql(cond: String, t: String, p: String): String = {
    val r = s"(($cond) / $c35150)"
    val rtT = s"(${C(0)} + ($t) * ${C(1)} + ($t) * ($t) * ${C(2)} + " +
      s"($t) * ($t) * ($t) * ${C(3)} + ($t) * ($t) * ($t) * ($t) * ${C(4)})"
    val rp = s"(1.0 + (($p) * (${E(0)} + ($p) * ${E(1)} + ($p) * ($p) * ${E(2)})) / " +
      s"(1.0 + ($t) * ${D(0)} + ($t) * ($t) * ${D(1)} + (${D(2)} + ($t) * ${D(3)}) * $r))"
    val rt = s"($r / ($rp * $rtT))"
    val srt = s"SQRT($rt)"
    def poly(cs: Seq[Double]): String =
      s"(${cs(0)} + $srt * ${cs(1)} + $rt * ${cs(2)} + $rt * $srt * ${cs(3)} + " +
        s"$rt * $rt * ${cs(4)} + $rt * $rt * $srt * ${cs(5)})"
    s"(${poly(A)} + ((($t) - 15.0) / (1.0 + (($t) - 15.0) * $K)) * ${poly(B)})"
  }
}
