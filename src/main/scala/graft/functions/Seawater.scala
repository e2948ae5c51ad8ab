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

  /** Scalar [[sigmaT]] for driver-side reference constants (e.g. the
    * ρ(35, 0) denominator of specific volume anomaly) — same
    * association order as the column form, so the constant matches what
    * either engine would compute.
    */
  def sigmaTConst(sp: Double, t: Double): Double = {
    val rhoW = RW(0) + t * RW(1) + t * t * RW(2) + t * t * t * RW(3) +
      t * t * t * t * RW(4) + t * t * t * t * t * RW(5)
    val bPoly = RB(0) + t * RB(1) + t * t * RB(2) + t * t * t * RB(3) + t * t * t * t * RB(4)
    val cPoly = RC(0) + t * RC(1) + t * t * RC(2)
    rhoW + sp * bPoly + sp * math.sqrt(sp) * cPoly + sp * sp * RD0 - 1000.0
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

  // --- Potential temperature (UNESCO 1983, Fofonoff & Millard) ---------
  //
  // Written ONCE over a tiny numeric algebra and instantiated for both
  // Column and SQL-string forms — the two sides share the exact same
  // expression structure, so IEEE doubles match bit-for-bit across
  // engines (the Runge-Kutta chaining makes hand-duplicated twins too
  // error-prone).
  private trait Num[T] {
    def const(v: Double): T
    def add(a: T, b: T): T
    def sub(a: T, b: T): T
    def mul(a: T, b: T): T
    def div(a: T, b: T): T
    /** √, ln, eˣ. sqrt is IEEE-exact everywhere; ln/exp are libm calls
      * that can differ by one ulp between the JVM and other engines —
      * measured ~3e-4 of inputs for ln — which post-quantization flips a
      * 1e-4 bucket with probability ~ulp/bucket ≈ 6e-10 per row.
      * Acceptable for quantized oracle comparisons; do not use un-quantized.
      */
    def sqrtN(a: T): T
    def lnN(a: T): T
    def expN(a: T): T
    /** if (a < b) x else y — comparison branches are exact (no float
      * rounding), so the two engines always take the same arm.
      */
    def ifLt(a: T, b: T, x: T, y: T): T
    /** if (a <= b) x else y. */
    def ifLe(a: T, b: T, x: T, y: T): T
    /** atan2(y, x) — libm on both engines; like ln/exp it can differ by
      * one ulp between the JVM and DuckDB, so only use quantized.
      */
    def atan2N(y: T, x: T): T
    /** sin — libm on both engines, same one-ulp caveat as atan2/ln/exp;
      * only use quantized.
      */
    def sinN(a: T): T
  }
  private object ColNum extends Num[Column] {
    def const(v: Double): Column = lit(v)
    def add(a: Column, b: Column): Column = a + b
    def sub(a: Column, b: Column): Column = a - b
    def mul(a: Column, b: Column): Column = a * b
    def div(a: Column, b: Column): Column = a / b
    def sqrtN(a: Column): Column = sqrt(a)
    def lnN(a: Column): Column = log(a)
    def expN(a: Column): Column = exp(a)
    def ifLt(a: Column, b: Column, x: Column, y: Column): Column =
      when(a < b, x).otherwise(y)
    def ifLe(a: Column, b: Column, x: Column, y: Column): Column =
      when(a <= b, x).otherwise(y)
    def atan2N(y: Column, x: Column): Column = atan2(y, x)
    def sinN(a: Column): Column = sin(a)
  }
  private object SqlNum extends Num[String] {
    def const(v: Double): String = {
      // e-notation: DuckDB types plain decimal literals DECIMAL(18,17)
      // and may multiply in decimal (FLOAT operands don't force the
      // double promotion) — e-notation parses as DOUBLE, keeping both
      // engines on the identical IEEE ops. %.17e round-trips exactly.
      val s = String.format(java.util.Locale.ROOT, "%.17e", Double.box(v))
      // negative constants must parenthesize or "a * -b" miparses
      if (v < 0) s"($s)" else s
    }
    def add(a: String, b: String): String = s"($a + $b)"
    def sub(a: String, b: String): String = s"($a - $b)"
    def mul(a: String, b: String): String = s"($a * $b)"
    def div(a: String, b: String): String = s"($a / $b)"
    def sqrtN(a: String): String = s"SQRT($a)"
    def lnN(a: String): String = s"LN($a)"
    def expN(a: String): String = s"EXP($a)"
    def ifLt(a: String, b: String, x: String, y: String): String =
      s"(CASE WHEN $a < $b THEN $x ELSE $y END)"
    def ifLe(a: String, b: String, x: String, y: String): String =
      s"(CASE WHEN $a <= $b THEN $x ELSE $y END)"
    def atan2N(y: String, x: String): String = s"ATAN2($y, $x)"
    def sinN(a: String): String = s"SIN($a)"
  }

  /** Adiabatic temperature gradient (°C/dbar), UNESCO 1983 `atg`:
    * s practical salinity, t °C (IPTS-68), p dbar.
    */
  private def atgG[T](s: T, t: T, p: T)(implicit N: Num[T]): T = {
    import N._
    val s35 = sub(s, const(35.0))
    // c0 + x·(c1 + x·(c2 + …)) — one nesting shape shared by both sides
    def horner(x: T, cs: Double*): T =
      cs.init.foldRight(const(cs.last))((c, acc) => add(const(c), mul(x, acc)))
    val term1 = horner(t, 3.5803e-5, 8.5258e-6, -6.836e-8, 6.6228e-10)
    val term2 = mul(add(const(1.8932e-6), mul(const(-4.2393e-8), t)), s35)
    val term3 = mul(horner(t, 1.8741e-8, -6.7795e-10, 8.733e-12, -5.4481e-14), p)
    val term4 = mul(mul(add(const(-1.1351e-10), mul(const(2.7759e-12), t)), s35), p)
    val term5 = mul(mul(horner(t, -4.6206e-13, 1.8676e-14, -2.1687e-16), p), p)
    add(add(add(add(term1, term2), term3), term4), term5)
  }

  /** Adiabatic lapse rate as a Column expression (°C/dbar). */
  def atg(s: Column, t: Column, p: Column): Column = atgG(s, t, p)(ColNum)

  /** SQL twin of [[atg]] — generated from the same algebra, so doubles
    * match bit-for-bit.
    */
  def atgSql(s: String, t: String, p: String): String =
    atgG(s"($s)", s"($t)", s"($p)")(SqlNum)

  /** RK4 coefficients for the UNESCO `ptmp` integration, computed once so
    * the Column and SQL forms embed the identical double constants.
    */
  object Rk {
    val sq2: Double = math.sqrt(2.0)
    val c2a: Double = 1.0 - 1.0 / sq2
    val q2a: Double = 2.0 - sq2
    val q2b: Double = -2.0 + 3.0 / sq2
    val c3a: Double = 1.0 + 1.0 / sq2
    val q3a: Double = 2.0 + sq2
    val q3b: Double = -2.0 - 3.0 / sq2
  }

  /** Potential temperature θ(s, t, p → pr), UNESCO 1983 `ptmp` (4th-order
    * Runge-Kutta over the adiabatic gradient). Check value:
    * θ(40, 40, 10000, 0) = 36.89073 °C.
    */
  private def ptmpG[T](s: T, t0: T, p0: T, pr: T)(implicit N: Num[T]): T = {
    import N._
    val dP = sub(pr, p0)
    val dt1 = mul(dP, atgG(s, t0, p0))
    val th1 = add(t0, mul(const(0.5), dt1))
    val q1 = dt1
    val pHalf = add(p0, mul(const(0.5), dP))
    val dt2 = mul(dP, atgG(s, th1, pHalf))
    val th2 = add(th1, mul(const(Rk.c2a), sub(dt2, q1)))
    val q2 = add(mul(const(Rk.q2a), dt2), mul(const(Rk.q2b), q1))
    val dt3 = mul(dP, atgG(s, th2, pHalf))
    val th3 = add(th2, mul(const(Rk.c3a), sub(dt3, q2)))
    val q3 = add(mul(const(Rk.q3a), dt3), mul(const(Rk.q3b), q2))
    val dt4 = mul(dP, atgG(s, th3, pr))
    add(th3, div(sub(dt4, mul(const(2.0), q3)), const(6.0)))
  }

  /** Potential temperature as ONE Column expression. Each RK stage
    * re-inlines the previous stage's temperature, so the tree grows
    * ~1800× the size of one [[atg]] — fine for scalar checks, but in a
    * pipeline use [[withPotentialTemp]], which materializes each stage as
    * a named column (the optimizer keeps non-cheap multi-referenced
    * aliases, so the plan stays linear in the number of stages).
    */
  def potentialTemp(s: Column, t: Column, p: Column, pRef: Column): Column =
    ptmpG(s, t, p, pRef)(ColNum)

  /** Step-chained potential temperature over a DataFrame: appends `out`
    * computing θ(sCol, tCol, pCol → pRef) with each RK4 stage a named
    * intermediate column. This is the 100 TB form — the physical plan
    * carries 4 atg evaluations, not an exponentially inlined tree.
    * [[ptmpStepSqls]] emits the identical stage chain for the oracle.
    */
  def withPotentialTemp(df: org.apache.spark.sql.DataFrame,
                        sCol: Column, tCol: Column, pCol: Column,
                        pRef: Double, out: String): org.apache.spark.sql.DataFrame = {
    import Rk._
    df.withColumn("__s", sCol).withColumn("__t", tCol).withColumn("__p", pCol)
      .withColumn("__dP", lit(pRef) - col("__p"))
      .withColumn("__dt1", col("__dP") * atg(col("__s"), col("__t"), col("__p")))
      .withColumn("__th1", col("__t") + lit(0.5) * col("__dt1"))
      .withColumn("__pH", col("__p") + lit(0.5) * col("__dP"))
      .withColumn("__dt2", col("__dP") * atg(col("__s"), col("__th1"), col("__pH")))
      .withColumn("__th2", col("__th1") + lit(c2a) * (col("__dt2") - col("__dt1")))
      .withColumn("__q2", lit(q2a) * col("__dt2") + lit(q2b) * col("__dt1"))
      .withColumn("__dt3", col("__dP") * atg(col("__s"), col("__th2"), col("__pH")))
      .withColumn("__th3", col("__th2") + lit(c3a) * (col("__dt3") - col("__q2")))
      .withColumn("__q3", lit(q3a) * col("__dt3") + lit(q3b) * col("__q2"))
      .withColumn("__dt4", col("__dP") * atg(col("__s"), col("__th3"), lit(pRef)))
      .withColumn(out, col("__th3") + (col("__dt4") - lit(2.0) * col("__q3")) / lit(6.0))
      .drop("__s", "__t", "__p", "__dP", "__dt1", "__th1", "__pH", "__dt2",
        "__th2", "__q2", "__dt3", "__th3", "__q3", "__dt4")
  }

  /** Nested-subquery SQL mirroring [[withPotentialTemp]]'s stage chain:
    * wraps `from` (a relation or subquery) in one subquery per stage and
    * yields θ as column `out`. Same constants, same association order.
    */
  def ptmpStepSql(from: String, s: String, t: String, p: String,
                  pRef: Double, out: String): String = {
    import Rk._
    val l0 = s"SELECT *, ($s) AS __s, ($t) AS __t, ($p) AS __p FROM $from"
    val l1 = s"SELECT *, ($pRef - __p) AS __dP FROM ($l0)"
    val l2 = s"SELECT *, (__dP * ${atgSql("__s", "__t", "__p")}) AS __dt1 FROM ($l1)"
    val l3 = s"SELECT *, (__t + (0.5 * __dt1)) AS __th1, (__p + (0.5 * __dP)) AS __pH FROM ($l2)"
    val l4 = s"SELECT *, (__dP * ${atgSql("__s", "__th1", "__pH")}) AS __dt2 FROM ($l3)"
    val l5 = s"SELECT *, (__th1 + ($c2a * (__dt2 - __dt1))) AS __th2, " +
      s"(($q2a * __dt2) + (($q2b) * __dt1)) AS __q2 FROM ($l4)"
    val l6 = s"SELECT *, (__dP * ${atgSql("__s", "__th2", "__pH")}) AS __dt3 FROM ($l5)"
    val l7 = s"SELECT *, (__th2 + ($c3a * (__dt3 - __q2))) AS __th3, " +
      s"(($q3a * __dt3) + (($q3b) * __q2)) AS __q3 FROM ($l6)"
    val l8 = s"SELECT *, (__dP * ${atgSql("__s", "__th3", s"$pRef")}) AS __dt4 FROM ($l7)"
    s"SELECT *, (__th3 + ((__dt4 - (2.0 * __q3)) / 6.0)) AS $out FROM ($l8)"
  }

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

  // --- Oxygen solubility & freezing point ------------------------------

  /** Oxygen solubility at 1 atm (µmol/kg), Garcia & Gordon (1992)
    * combined fit to the Benson & Krause data — the saturation basis for
    * percent-saturation oxygen handling (the reference bundles GSW's
    * gsw_O2sol_SP_pt for this; OceanNcVar.py's oxygen branches consume
    * it). Check value: O2sol(35, 10) ≈ 274.61 µmol/kg.
    */
  private def o2solG[T](s: T, t: T)(implicit N: Num[T]): T = {
    import N._
    def horner(x: T, cs: Double*): T =
      cs.init.foldRight(const(cs.last))((c, acc) => add(const(c), mul(x, acc)))
    val ts = lnN(div(sub(const(298.15), t), add(const(273.15), t)))
    val a = horner(ts, 5.80871, 3.20291, 4.17887, 5.10006, -9.86643e-2, 3.80369)
    val b = horner(ts, -7.01577e-3, -7.70028e-3, -1.13864e-2, -9.51519e-3)
    expN(add(add(a, mul(s, b)), mul(const(-2.75915e-7), mul(s, s))))
  }
  def o2Solubility(s: Column, t: Column): Column = o2solG(s, t)(ColNum)
  def o2SolubilitySql(s: String, t: String): String = o2solG(s"($s)", s"($t)")(SqlNum)

  /** Freezing point of seawater (°C), UNESCO 1983 (Millero & Leung 1976
    * fit): tf = −0.0575·S + 1.710523e−3·S^1.5 − 2.154996e−4·S² − 7.53e−4·p.
    * Check value: tf(35, 0) ≈ −1.9223 °C. Pure +,·,√ — bit-identical
    * across engines, no transcendentals.
    */
  private def freezeG[T](s: T, p: T)(implicit N: Num[T]): T = {
    import N._
    add(add(add(mul(const(-0.0575), s),
      mul(const(1.710523e-3), mul(s, sqrtN(s)))),
      mul(const(-2.154996e-4), mul(s, s))),
      mul(const(-7.53e-4), p))
  }
  def freezingPoint(s: Column, p: Column): Column = freezeG(s, p)(ColNum)
  def freezingPointSql(s: String, p: String): String = freezeG(s"($s)", s"($p)")(SqlNum)

  /** Conservative Temperature from potential temperature, TEOS-10
    * `gsw_ct_from_pt` (reference bundles it:
    * GSW-Python/gsw-3.3.1/src/c_gsw/gsw_oceanographic_toolbox.c:1401-1440):
    * potential enthalpy polynomial in (√(sfac·SA), pt/40) divided by
    * cp₀ = 3991.86795711963 J/(kg·K). Check value:
    * CT(34.7118, 28.7856) ≈ 28.80992 °C. Rational polynomial + sqrt only
    * — bit-identical across engines.
    */
  private def ctFromPtG[T](sa: T, pt: T)(implicit N: Num[T]): T = {
    import N._
    val x2 = mul(const(0.0248826675584615), sa) // gsw_sfac·SA
    val x = sqrtN(x2)
    val y = mul(pt, const(0.025))
    def tail(a: Double, b: Double): T = mul(add(const(a), mul(const(b), y)), y)
    val s1 = add(const(61.01362420681071), mul(y, add(const(168776.46138048015),
      mul(y, add(const(-2735.2785605119625), mul(y, add(const(2574.2164453821433),
        mul(y, add(const(-1536.6644434977543), mul(y, add(const(545.7340497931629),
          tail(-50.91091728474331, -18.30489878927802))))))))))))
    val s2 = add(const(268.5520265845071), mul(y, add(const(-12019.028203559312),
      mul(y, add(const(3734.858026725145), mul(y, add(const(-2046.7671145057618),
        mul(y, add(const(465.28655623826234),
          tail(-0.6370820302376359, -10.650848542359153))))))))))
    val s3 = add(const(937.2099110620707), mul(y, add(const(588.1802812170108),
      mul(y, add(const(248.39476522971285),
        tail(-3.871557904936333, -2.6268019854268356))))))
    val sx = add(add(const(-1687.914374187449),
      mul(x, add(const(246.9598888781377),
        mul(x, add(const(123.59576582457964), mul(const(-48.5891069025409), x)))))),
      mul(y, add(const(936.3206544460336), mul(y, add(const(-942.7827304544439),
        mul(y, add(const(369.4389437509002),
          tail(-33.83664947895248, -9.987880382780322))))))))
    val pot = add(s1, mul(x2, add(s2, mul(x, add(s3, mul(x, sx))))))
    div(pot, const(3991.86795711963))
  }
  def conservativeTemp(sa: Column, pt: Column): Column = ctFromPtG(sa, pt)(ColNum)
  def conservativeTempSql(sa: String, pt: String): String =
    ctFromPtG(s"($sa)", s"($pt)")(SqlNum)

  // --- TEOS-10 Absolute Salinity & in-situ density ----------------------

  /** Standard-ocean reference salinity SSO and the SP→SA scaling
    * u_PS = SSO/35 (gsw_internal_const.h GSW_TEOS10_CONSTANTS).
    */
  val gswSso = 35.16504
  val gswUps: Double = gswSso / 35.0

  /** Absolute Salinity from Practical Salinity, TEOS-10 `gsw_sa_from_sp`
    * (reference bundle: gsw_oceanographic_toolbox.c:8961-8994) with one
    * DOCUMENTED DEVIATION: the open-ocean Absolute Salinity Anomaly
    * Ratio (SAAR — a 0.25°-gridded lookup table the reference ships as
    * binary data) is taken as 0, so open-ocean SA = u_PS·SP, the
    * reference-composition scaling gsw itself returns where the anomaly
    * is undefined. Inside the Baltic the published analytic form applies
    * — SA = (SSO−0.087)/35·SP + 0.087 — gated by the same
    * piecewise-linear longitude bounds as the C (GSW_BALTIC_DATA
    * polygon: xb_left {12.6,7,26} over yb_left {50,59,69}, xb_right
    * {45,26} over yb_right {50,69}).
    */
  private def saFromSpG[T](sp: T, lon: T, lat: T)(implicit N: Num[T]): T = {
    import N._
    // piecewise-linear Baltic bounds in latitude (slopes precomputed as
    // doubles so both engines embed identical constants)
    val leftLo = add(const(12.6), mul(sub(lat, const(50.0)), const((7.0 - 12.6) / (59.0 - 50.0))))
    val leftHi = add(const(7.0), mul(sub(lat, const(59.0)), const((26.0 - 7.0) / (69.0 - 59.0))))
    val xxLeft = ifLt(lat, const(59.0), leftLo, leftHi)
    val xxRight = add(const(45.0), mul(sub(lat, const(50.0)), const((26.0 - 45.0) / (69.0 - 50.0))))
    val saBaltic = add(mul(const((gswSso - 0.087) / 35.0), sp), const(0.087))
    val saOpen = mul(const(gswUps), sp)
    // the conjunction of bounds as a chain of exact comparison branches
    // (every non-Baltic arm falls through to the open-ocean scaling)
    ifLt(const(7.0), lon,
      ifLt(lon, const(45.0),
        ifLt(const(50.0), lat,
          ifLt(lat, const(69.0),
            ifLe(xxLeft, lon,
              ifLe(lon, xxRight, saBaltic, saOpen),
              saOpen),
            saOpen),
          saOpen),
        saOpen),
      saOpen)
  }
  def saFromSp(sp: Column, lon: Column, lat: Column): Column =
    saFromSpG(sp, lon, lat)(ColNum)
  def saFromSpSql(sp: String, lon: String, lat: String): String =
    saFromSpG(s"($sp)", s"($lon)", s"($lat)")(SqlNum)

  /** TEOS-10 75-term specific volume v(SA, CT, p) m³/kg (Roquet et al.
    * 2015 polynomial), transcribed from the reference's bundled C —
    * gsw_oceanographic_toolbox.c `gsw_specvol` with the
    * GSW_SPECVOL_COEFFICIENTS table (gsw_internal_const.h) — with the
    * C's exact Horner nesting, so doubles match the reference
    * bit-for-bit. Inputs: Absolute Salinity g/kg, Conservative
    * Temperature °C, sea pressure dbar.
    */
  private def specvolG[T](sa: T, ct: T, p: T)(implicit N: Num[T]): T = {
    final class W(val t: T) {
      def +(o: W): W = new W(N.add(t, o.t))
      def *(o: W): W = new W(N.mul(t, o.t))
    }
    def c(v: Double): W = new W(N.const(v))
    val xs = new W(N.sqrtN(N.add(N.mul(N.const(0.0248826675584615), sa),
      N.const(5.971840214030754e-1))))
    val ys = new W(N.mul(ct, N.const(0.025)))
    val z = new W(N.mul(p, N.const(1e-4)))
    val v000 = c(1.0769995862e-3); val v001 = c(-6.0799143809e-5); val v002 = c(9.9856169219e-6)
    val v003 = c(-1.1309361437e-6); val v004 = c(1.0531153080e-7); val v005 = c(-1.2647261286e-8)
    val v006 = c(1.9613503930e-9); val v010 = c(-3.1038981976e-4); val v011 = c(2.4262468747e-5)
    val v012 = c(-5.8484432984e-7); val v013 = c(3.6310188515e-7); val v014 = c(-1.1147125423e-7)
    val v020 = c(6.6928067038e-4); val v021 = c(-3.4792460974e-5); val v022 = c(-4.8122251597e-6)
    val v023 = c(1.6746303780e-8); val v030 = c(-8.5047933937e-4); val v031 = c(3.7470777305e-5)
    val v032 = c(4.9263106998e-6); val v040 = c(5.8086069943e-4); val v041 = c(-1.7322218612e-5)
    val v042 = c(-1.7811974727e-6); val v050 = c(-2.1092370507e-4); val v051 = c(3.0927427253e-6)
    val v060 = c(3.1932457305e-5); val v100 = c(-1.5649734675e-5); val v101 = c(1.8505765429e-5)
    val v102 = c(-1.1736386731e-6); val v103 = c(-3.6527006553e-7); val v104 = c(3.1454099902e-7)
    val v110 = c(3.5009599764e-5); val v111 = c(-9.5677088156e-6); val v112 = c(-5.5699154557e-6)
    val v113 = c(-2.7295696237e-7); val v120 = c(-4.3592678561e-5); val v121 = c(1.1100834765e-5)
    val v122 = c(5.4620748834e-6); val v130 = c(3.4532461828e-5); val v131 = c(-9.8447117844e-6)
    val v132 = c(-1.3544185627e-6); val v140 = c(-1.1959409788e-5); val v141 = c(2.5909225260e-6)
    val v150 = c(1.3864594581e-6); val v200 = c(2.7762106484e-5); val v201 = c(-1.1716606853e-5)
    val v202 = c(2.1305028740e-6); val v203 = c(2.8695905159e-7); val v210 = c(-3.7435842344e-5)
    val v211 = c(-2.3678308361e-7); val v212 = c(3.9137387080e-7); val v220 = c(3.5907822760e-5)
    val v221 = c(2.9283346295e-6); val v222 = c(-6.5731104067e-7); val v230 = c(-1.8698584187e-5)
    val v231 = c(-4.8826139200e-7); val v240 = c(3.8595339244e-6); val v300 = c(-1.6521159259e-5)
    val v301 = c(7.9279656173e-6); val v302 = c(-4.6132540037e-7); val v310 = c(2.4141479483e-5)
    val v311 = c(-3.4558773655e-6); val v312 = c(7.7618888092e-9); val v320 = c(-1.4353633048e-5)
    val v321 = c(3.1655306078e-7); val v330 = c(2.2863324556e-6); val v400 = c(6.9111322702e-6)
    val v401 = c(-3.4102187482e-6); val v402 = c(-6.3352916514e-8); val v410 = c(-8.7595873154e-6)
    val v411 = c(1.2956717783e-6); val v420 = c(4.3703680598e-6); val v500 = c(-8.0539615540e-7)
    val v501 = c(5.0736766814e-7); val v510 = c(-3.3052758900e-7); val v600 = c(2.0543094268e-7)
    // verbatim Horner structure from gsw_specvol (one flat expression;
    // outer parens keep Scala from treating leading "+" lines as new
    // statements)
    val value = (v000
      + xs*(v010 + xs*(v020 + xs*(v030 + xs*(v040 + xs*(v050
      + v060*xs))))) + ys*(v100 + xs*(v110 + xs*(v120 + xs*(v130 + xs*(v140
      + v150*xs)))) + ys*(v200 + xs*(v210 + xs*(v220 + xs*(v230 + v240*xs)))
      + ys*(v300 + xs*(v310 + xs*(v320 + v330*xs)) + ys*(v400 + xs*(v410
      + v420*xs) + ys*(v500 + v510*xs + v600*ys))))) + z*(v001 + xs*(v011
      + xs*(v021 + xs*(v031 + xs*(v041 + v051*xs)))) + ys*(v101 + xs*(v111
      + xs*(v121 + xs*(v131 + v141*xs))) + ys*(v201 + xs*(v211 + xs*(v221
      + v231*xs)) + ys*(v301 + xs*(v311 + v321*xs) + ys*(v401 + v411*xs
      + v501*ys)))) + z*(v002 + xs*(v012 + xs*(v022 + xs*(v032 + v042*xs)))
      + ys*(v102 + xs*(v112 + xs*(v122 + v132*xs)) + ys*(v202 + xs*(v212
      + v222*xs) + ys*(v302 + v312*xs + v402*ys))) + z*(v003 + xs*(v013
      + v023*xs) + ys*(v103 + v113*xs + v203*ys) + z*(v004 + v014*xs + v104*ys
      + z*(v005 + v006*z))))))
    value.t
  }

  /** In-situ density ρ(SA, CT, p) = 1/v — TEOS-10 `gsw_rho`, the full
    * pressure-dependent equation of state. Check values (evaluated
    * through the reference's own C polynomial): ρ(35.16504, 0, 0) =
    * 1028.107021542752 (standard ocean), ρ(34.7118, 28.7856, 10) =
    * 1021.847994616171, ρ(34.7118, 28.7856, 1000) = 1025.963954409665.
    */
  def rhoTeos10(sa: Column, ct: Column, p: Column): Column =
    lit(1.0) / specvolG(sa, ct, p)(ColNum)
  def rhoTeos10Sql(sa: String, ct: String, p: String): String =
    s"(1.0 / ${specvolG(s"($sa)", s"($ct)", s"($p)")(SqlNum)})"

  /** Specific volume at the Standard Ocean Salinity (SSO = 35.16504 g/kg)
    * and CT = 0 °C as a function of pressure — the reference's streamlined
    * `gsw_specvol_sso_0` (gsw_oceanographic_toolbox.c:10202-10214): a
    * 6-term Horner in z = p·1e-4 sharing v005/v006 with the 75-term
    * table. Same nesting order as the C so doubles match bit-for-bit.
    */
  private def specvolSso0G[T](p: T)(implicit N: Num[T]): T = {
    val z = N.mul(p, N.const(1e-4))
    val l5 = N.add(N.const(-1.2647261286e-8),
      N.mul(N.const(1.9613503930e-9), z))
    val l4 = N.add(N.const(-2.994054447232880e-8), N.mul(z, l5))
    val l3 = N.add(N.const(-6.657179479768312e-7), N.mul(z, l4))
    val l2 = N.add(N.const(7.130728965927127e-6), N.mul(z, l3))
    val l1 = N.add(N.const(-4.505913211160929e-5), N.mul(z, l2))
    N.add(N.const(9.726613854843870e-4), N.mul(z, l1))
  }

  /** Specific volume anomaly relative to the standard ocean —
    * `gsw_specvol_anom_standard` (gsw_oceanographic_toolbox.c:9835-9838):
    * v(SA, CT, p) − v_SSO_0(p). This is the integrand of dynamic height
    * (the `b` array of gsw_geo_strf_dyn_height_1). Check values (via the
    * reference's own C): svan(34.7118, 28.8099, 10) =
    * 6.01051894897415735e-6, svan(34.8472, 10.2262, 250) =
    * 1.42190453761834902e-6, svan(34.7324, 4.3236, 1000) =
    * 7.63833895777387382e-7.
    */
  def svanStandard(sa: Column, ct: Column, p: Column): Column =
    ColNum.sub(specvolG(sa, ct, p)(ColNum), specvolSso0G(p)(ColNum))
  def svanStandardSql(sa: String, ct: String, p: String): String = {
    implicit val N: Num[String] = SqlNum
    N.sub(specvolG(s"($sa)", s"($ct)", s"($p)"), specvolSso0G(s"($p)"))
  }

  /** ∂v/∂CT part of the 75-term polynomial — the `a`-coefficient Horner
    * tree from the reference's `gsw_alpha`
    * (gsw_oceanographic_toolbox.c:242-265, coefficients
    * gsw_internal_const.h GSW_SPECVOL_COEFFICIENTS), same nesting order
    * so doubles match bit-for-bit.
    */
  private def vCtPartG[T](sa: T, ct: T, p: T)(implicit N: Num[T]): T = {
    final class W(val t: T) {
      def +(o: W): W = new W(N.add(t, o.t))
      def *(o: W): W = new W(N.mul(t, o.t))
    }
    def c(v: Double): W = new W(N.const(v))
    val xs = new W(N.sqrtN(N.add(N.mul(N.const(0.0248826675584615), sa),
      N.const(5.971840214030754e-1))))
    val ys = new W(N.mul(ct, N.const(0.025)))
    val z = new W(N.mul(p, N.const(1e-4)))
    val a000 = c(-1.56497346750e-5); val a001 = c(1.85057654290e-5); val a002 = c(-1.17363867310e-6)
    val a003 = c(-3.65270065530e-7); val a004 = c(3.14540999020e-7); val a010 = c(5.55242129680e-5)
    val a011 = c(-2.34332137060e-5); val a012 = c(4.26100574800e-6); val a013 = c(5.73918103180e-7)
    val a020 = c(-4.95634777770e-5); val a021 = c(2.37838968519e-5); val a022 = c(-1.38397620111e-6)
    val a030 = c(2.76445290808e-5); val a031 = c(-1.36408749928e-5); val a032 = c(-2.53411666056e-7)
    val a040 = c(-4.02698077700e-6); val a041 = c(2.53683834070e-6); val a050 = c(1.23258565608e-6)
    val a100 = c(3.50095997640e-5); val a101 = c(-9.56770881560e-6); val a102 = c(-5.56991545570e-6)
    val a103 = c(-2.72956962370e-7); val a110 = c(-7.48716846880e-5); val a111 = c(-4.73566167220e-7)
    val a112 = c(7.82747741600e-7); val a120 = c(7.24244384490e-5); val a121 = c(-1.03676320965e-5)
    val a122 = c(2.32856664276e-8); val a130 = c(-3.50383492616e-5); val a131 = c(5.18268711320e-6)
    val a140 = c(-1.65263794500e-6); val a200 = c(-4.35926785610e-5); val a201 = c(1.11008347650e-5)
    val a202 = c(5.46207488340e-6); val a210 = c(7.18156455200e-5); val a211 = c(5.85666925900e-6)
    val a212 = c(-1.31462208134e-6); val a220 = c(-4.30608991440e-5); val a221 = c(9.49659182340e-7)
    val a230 = c(1.74814722392e-5); val a300 = c(3.45324618280e-5); val a301 = c(-9.84471178440e-6)
    val a302 = c(-1.35441856270e-6); val a310 = c(-3.73971683740e-5); val a311 = c(-9.76522784000e-7)
    val a320 = c(6.85899736680e-6); val a400 = c(-1.19594097880e-5); val a401 = c(2.59092252600e-6)
    val a410 = c(7.71906784880e-6); val a500 = c(1.38645945810e-6)
    val value = (a000
      + xs*(a100 + xs*(a200 + xs*(a300 + xs*(a400 + a500*xs))))
      + ys*(a010 + xs*(a110 + xs*(a210 + xs*(a310 + a410*xs)))
      + ys*(a020 + xs*(a120 + xs*(a220 + a320*xs)) + ys*(a030
      + xs*(a130 + a230*xs) + ys*(a040 + a140*xs + a050*ys))))
      + z*(a001 + xs*(a101 + xs*(a201 + xs*(a301 + a401*xs)))
      + ys*(a011 + xs*(a111 + xs*(a211 + a311*xs)) + ys*(a021
      + xs*(a121 + a221*xs) + ys*(a031 + a131*xs + a041*ys)))
      + z*(a002 + xs*(a102 + xs*(a202 + a302*xs)) + ys*(a012
      + xs*(a112 + a212*xs) + ys*(a022 + a122*xs + a032*ys))
      + z*(a003 + a103*xs + a013*ys + a004*z))))
    value.t
  }

  /** ∂v/∂SA part — the `b`-coefficient Horner tree from the reference's
    * `gsw_beta` (gsw_oceanographic_toolbox.c:386-409), same nesting.
    */
  private def vSaPartG[T](sa: T, ct: T, p: T)(implicit N: Num[T]): T = {
    final class W(val t: T) {
      def +(o: W): W = new W(N.add(t, o.t))
      def *(o: W): W = new W(N.mul(t, o.t))
    }
    def c(v: Double): W = new W(N.const(v))
    val xs = new W(N.sqrtN(N.add(N.mul(N.const(0.0248826675584615), sa),
      N.const(5.971840214030754e-1))))
    val ys = new W(N.mul(ct, N.const(0.025)))
    val z = new W(N.mul(p, N.const(1e-4)))
    val b000 = c(-3.10389819760e-4); val b001 = c(2.42624687470e-5); val b002 = c(-5.84844329840e-7)
    val b003 = c(3.63101885150e-7); val b004 = c(-1.11471254230e-7); val b010 = c(3.50095997640e-5)
    val b011 = c(-9.56770881560e-6); val b012 = c(-5.56991545570e-6); val b013 = c(-2.72956962370e-7)
    val b020 = c(-3.74358423440e-5); val b021 = c(-2.36783083610e-7); val b022 = c(3.91373870800e-7)
    val b030 = c(2.41414794830e-5); val b031 = c(-3.45587736550e-6); val b032 = c(7.76188880920e-9)
    val b040 = c(-8.75958731540e-6); val b041 = c(1.29567177830e-6); val b050 = c(-3.30527589000e-7)
    val b100 = c(1.33856134076e-3); val b101 = c(-6.95849219480e-5); val b102 = c(-9.62445031940e-6)
    val b103 = c(3.34926075600e-8); val b110 = c(-8.71853571220e-5); val b111 = c(2.22016695300e-5)
    val b112 = c(1.09241497668e-5); val b120 = c(7.18156455200e-5); val b121 = c(5.85666925900e-6)
    val b122 = c(-1.31462208134e-6); val b130 = c(-2.87072660960e-5); val b131 = c(6.33106121560e-7)
    val b140 = c(8.74073611960e-6); val b200 = c(-2.55143801811e-3); val b201 = c(1.12412331915e-4)
    val b202 = c(1.47789320994e-5); val b210 = c(1.03597385484e-4); val b211 = c(-2.95341353532e-5)
    val b212 = c(-4.06325568810e-6); val b220 = c(-5.60957525610e-5); val b221 = c(-1.46478417600e-6)
    val b230 = c(6.85899736680e-6); val b300 = c(2.32344279772e-3); val b301 = c(-6.92888744480e-5)
    val b302 = c(-7.12478989080e-6); val b310 = c(-4.78376391520e-5); val b311 = c(1.03636901040e-5)
    val b320 = c(1.54381356976e-5); val b400 = c(-1.05461852535e-3); val b401 = c(1.54637136265e-5)
    val b410 = c(6.93229729050e-6); val b500 = c(1.91594743830e-4)
    val value = (b000
      + xs*(b100 + xs*(b200 + xs*(b300 + xs*(b400 + b500*xs))))
      + ys*(b010 + xs*(b110 + xs*(b210 + xs*(b310 + b410*xs)))
      + ys*(b020 + xs*(b120 + xs*(b220 + b320*xs)) + ys*(b030
      + xs*(b130 + b230*xs) + ys*(b040 + b140*xs + b050*ys))))
      + z*(b001 + xs*(b101 + xs*(b201 + xs*(b301 + b401*xs)))
      + ys*(b011 + xs*(b111 + xs*(b211 + b311*xs)) + ys*(b021
      + xs*(b121 + b221*xs) + ys*(b031 + b131*xs + b041*ys)))
      + z*(b002 + xs*(b102 + xs*(b202 + b302*xs)) + ys*(b012
      + xs*(b112 + b212*xs) + ys*(b022 + b122*xs + b032*ys))
      + z*(b003 + b103*xs + b013*ys + b004*z))))
    value.t
  }

  private def alphaG[T](sa: T, ct: T, p: T)(implicit N: Num[T]): T =
    N.div(N.mul(N.const(0.025), vCtPartG(sa, ct, p)), specvolG(sa, ct, p))

  private def betaG[T](sa: T, ct: T, p: T)(implicit N: Num[T]): T = {
    val xs = N.sqrtN(N.add(N.mul(N.const(0.0248826675584615), sa),
      N.const(5.971840214030754e-1)))
    N.div(N.mul(N.mul(vSaPartG(sa, ct, p), N.const(-0.5)),
      N.const(0.0248826675584615)), N.mul(specvolG(sa, ct, p), xs))
  }

  /** Dynamic-enthalpy part of the 75-term polynomial — the
    * pressure-integrated `h`-coefficient Horner tree from the
    * reference's `gsw_dynamic_enthalpy`
    * (gsw_oceanographic_toolbox.c:1856-1884, coefficients
    * gsw_internal_const.h), same nesting so doubles match the C
    * bit-for-bit. Result scaled by db2pa·1e4 = 1e8 like the C.
    */
  private def dynEnthalpyG[T](sa: T, ct: T, p: T)(implicit N: Num[T]): T = {
    final class W(val t: T) {
      def +(o: W): W = new W(N.add(t, o.t))
      def *(o: W): W = new W(N.mul(t, o.t))
    }
    def c(v: Double): W = new W(N.const(v))
    val xs = new W(N.sqrtN(N.add(N.mul(N.const(0.0248826675584615), sa),
      N.const(5.971840214030754e-1))))
    val ys = new W(N.mul(ct, N.const(0.025)))
    val z = new W(N.mul(p, N.const(1e-4)))
    val h001 = c(1.07699958620e-3); val h002 = c(-3.03995719050e-5); val h003 = c(3.32853897400e-6)
    val h004 = c(-2.82734035930e-7); val h005 = c(2.10623061600e-8); val h006 = c(-2.10787688100e-9)
    val h007 = c(2.80192913290e-10); val h011 = c(-1.56497346750e-5); val h012 = c(9.25288271450e-6)
    val h013 = c(-3.91212891030e-7); val h014 = c(-9.13175163830e-8); val h015 = c(6.29081998040e-8)
    val h021 = c(2.77621064840e-5); val h022 = c(-5.85830342650e-6); val h023 = c(7.10167624670e-7)
    val h024 = c(7.17397628980e-8); val h031 = c(-1.65211592590e-5); val h032 = c(3.96398280870e-6)
    val h033 = c(-1.53775133460e-7); val h041 = c(6.91113227020e-6); val h042 = c(-1.70510937410e-6)
    val h043 = c(-2.11176388380e-8); val h051 = c(-8.05396155400e-7); val h052 = c(2.53683834070e-7)
    val h061 = c(2.05430942680e-7); val h101 = c(-3.10389819760e-4); val h102 = c(1.21312343735e-5)
    val h103 = c(-1.94948109950e-7); val h104 = c(9.07754712880e-8); val h105 = c(-2.22942508460e-8)
    val h111 = c(3.50095997640e-5); val h112 = c(-4.78385440780e-6); val h113 = c(-1.85663848520e-6)
    val h114 = c(-6.82392405930e-8); val h121 = c(-3.74358423440e-5); val h122 = c(-1.18391541805e-7)
    val h123 = c(1.30457956930e-7); val h131 = c(2.41414794830e-5); val h132 = c(-1.72793868275e-6)
    val h133 = c(2.58729626970e-9); val h141 = c(-8.75958731540e-6); val h142 = c(6.47835889150e-7)
    val h151 = c(-3.30527589000e-7); val h201 = c(6.69280670380e-4); val h202 = c(-1.73962304870e-5)
    val h203 = c(-1.60407505320e-6); val h204 = c(4.18657594500e-9); val h211 = c(-4.35926785610e-5)
    val h212 = c(5.55041738250e-6); val h213 = c(1.82069162780e-6); val h221 = c(3.59078227600e-5)
    val h222 = c(1.46416731475e-6); val h223 = c(-2.19103680220e-7); val h231 = c(-1.43536330480e-5)
    val h232 = c(1.58276530390e-7); val h241 = c(4.37036805980e-6); val h301 = c(-8.50479339370e-4)
    val h302 = c(1.87353886525e-5); val h303 = c(1.64210356660e-6); val h311 = c(3.45324618280e-5)
    val h312 = c(-4.92235589220e-6); val h313 = c(-4.51472854230e-7); val h321 = c(-1.86985841870e-5)
    val h322 = c(-2.44130696000e-7); val h331 = c(2.28633245560e-6); val h401 = c(5.80860699430e-4)
    val h402 = c(-8.66110930600e-6); val h403 = c(-5.93732490900e-7); val h411 = c(-1.19594097880e-5)
    val h412 = c(1.29546126300e-6); val h421 = c(3.85953392440e-6); val h501 = c(-2.10923705070e-4)
    val h502 = c(1.54637136265e-6); val h511 = c(1.38645945810e-6); val h601 = c(3.19324573050e-5)
    val part = (z*(h001 + xs*(h101 + xs*(h201 + xs*(h301 + xs*(h401 + xs*(h501
      + h601*xs))))) + ys*(h011 + xs*(h111 + xs*(h211 + xs*(h311 + xs*(h411
      + h511*xs)))) + ys*(h021 + xs*(h121 + xs*(h221 + xs*(h321 + h421*xs)))
      + ys*(h031 + xs*(h131 + xs*(h231 + h331*xs)) + ys*(h041 + xs*(h141
      + h241*xs) + ys*(h051 + h151*xs + h061*ys))))) + z*(h002 + xs*(h102
      + xs*(h202 + xs*(h302 + xs*(h402 + h502*xs)))) + ys*(h012 + xs*(h112
      + xs*(h212 + xs*(h312 + h412*xs))) + ys*(h022 + xs*(h122 + xs*(h222
      + h322*xs)) + ys*(h032 + xs*(h132 + h232*xs) + ys*(h042 + h142*xs
      + h052*ys)))) + z*(h003 + xs*(h103 + xs*(h203 + xs*(h303 + h403*xs)))
      + ys*(h013 + xs*(h113 + xs*(h213 + h313*xs)) + ys*(h023 + xs*(h123
      + h223*xs) + ys*(h033 + h133*xs + h043*ys))) + z*(h004 + xs*(h104
      + h204*xs) + ys*(h014 + h114*xs + h024*ys) + z*(h005 + h105*xs
      + h015*ys + z*(h006 + h007*z)))))))
    N.mul(part.t, N.const(1e8))
  }

  private def enthalpyG[T](sa: T, ct: T, p: T)(implicit N: Num[T]): T =
    N.add(N.mul(N.const(3991.86795711963), ct), dynEnthalpyG(sa, ct, p))

  /** Specific enthalpy h(SA, CT, p) J/kg — TEOS-10 `gsw_enthalpy`
    * (gsw_oceanographic_toolbox.c:1900-1923): cp0·CT plus the
    * pressure-integral (dynamic) enthalpy from the 75-term polynomial.
    * The heat-content currency of ocean heat transport budgets. Check
    * values (evaluated through the reference's own C polynomial on the
    * standard TEOS-10 profile): h(34.7118, 28.8099, 10) =
    * 115103.181355909, h(34.8472, 10.2262, 250) = 43255.371302628,
    * h(34.7324, 4.3236, 1000) = 26970.684160346.
    */
  def enthalpyTeos10(sa: Column, ct: Column, p: Column): Column =
    enthalpyG(sa, ct, p)(ColNum)
  def enthalpyTeos10Sql(sa: String, ct: String, p: String): String =
    enthalpyG(s"($sa)", s"($ct)", s"($p)")(SqlNum)

  /** Enthalpy at Standard Ocean Salinity and CT = 0 °C as a function of
    * pressure alone — the streamlined `gsw_enthalpy_sso_0`
    * (gsw_oceanographic_toolbox.c:2414-2427): the z-only chain of the
    * dynamic-enthalpy coefficients (h001…h007, gsw_internal_const.h),
    * same nesting, scaled by db2pa·1e4 = 1e8 like the C. Feeds the
    * pressure→height inversion in [[zFromPTeos10]].
    */
  private def enthalpySso0G[T](p: T)(implicit N: Num[T]): T = {
    import N._
    val z = mul(p, const(1e-4))
    val part = mul(z, add(const(9.726613854843870e-4),
      mul(z, add(const(-2.252956605630465e-5),
        mul(z, add(const(2.376909655387404e-6),
          mul(z, add(const(-1.664294869986011e-7),
            mul(z, add(const(-5.988108894465758e-9),
              mul(z, add(const(-2.10787688100e-9),
                mul(z, const(2.80192913290e-10))))))))))))))
    // the C scales `part*db2pa*1.0e4` — two rounded multiplies, kept
    // verbatim (a single ·1e8 can differ by one ulp)
    mul(mul(part, const(1e4)), const(1e4))
  }

  private def zFromPG[T](p: T, lat: T)(implicit N: Num[T]): T = {
    import N._
    val x = sinN(mul(lat, const(math.Pi / 180.0)))
    val sin2 = mul(x, x)
    // somigliana gravity at the surface: 9.780327·(1 + (5.2792e-3 + 2.32e-5·sin²)·sin²)
    val b = mul(const(9.780327), add(const(1.0),
      mul(add(const(5.2792e-3), mul(const(2.32e-5), sin2)), sin2)))
    // a = −0.5·gamma·b, gamma = 2.26e-7 (the C folds −0.5·gamma exactly)
    val a = mul(const(-0.5 * 2.26e-7), b)
    val c = enthalpySso0G(p) // geo_strf_dyn_height = sea_surface_geopot = 0
    div(mul(const(-2.0), c),
      add(b, sqrtN(sub(mul(b, b), mul(mul(const(4.0), a), c)))))
  }

  /** Height z (m, NEGATIVE below the sea surface) from sea pressure p
    * (dbar) and latitude — TEOS-10 `gsw_z_from_p`
    * (gsw_oceanographic_toolbox.c:11399-11417) with the dynamic-height
    * and sea-surface-geopotential terms at their zero defaults, exactly
    * as `gsw.geostrophy.distance` calls it (geostrophy.py:209): the
    * quadratic-formula inversion of the hydrostatic integral with
    * Somigliana surface gravity and the gamma = 2.26e-7 depth gradient.
    * Check values (C formula replayed in double precision): z(10, 4) =
    * -9.944583446945298, z(1000, 4) = -992.0919060719987, z(5000, 60) =
    * -4895.713388014601.
    */
  def zFromPTeos10(p: Column, lat: Column): Column = zFromPG(p, lat)(ColNum)
  def zFromPTeos10Sql(p: String, lat: String): String =
    zFromPG(s"($p)", s"($lat)")(SqlNum)

  /** ∂v/∂p part (z-chain) of the 75-term polynomial — the
    * `c`-coefficient Horner tree from the reference's `gsw_sound_speed`
    * (gsw_oceanographic_toolbox.c:9320-9357), same nesting.
    */
  private def vPPartG[T](sa: T, ct: T, p: T)(implicit N: Num[T]): T = {
    final class W(val t: T) {
      def +(o: W): W = new W(N.add(t, o.t))
      def *(o: W): W = new W(N.mul(t, o.t))
    }
    def c(v: Double): W = new W(N.const(v))
    val xs = new W(N.sqrtN(N.add(N.mul(N.const(0.0248826675584615), sa),
      N.const(5.971840214030754e-1))))
    val ys = new W(N.mul(ct, N.const(0.025)))
    val z = new W(N.mul(p, N.const(1e-4)))
    val c000 = c(-6.07991438090e-5); val c001 = c(1.99712338438e-5); val c002 = c(-3.39280843110e-6)
    val c003 = c(4.21246123200e-7); val c004 = c(-6.32363064300e-8); val c005 = c(1.17681023580e-8)
    val c010 = c(1.85057654290e-5); val c011 = c(-2.34727734620e-6); val c012 = c(-1.09581019659e-6)
    val c013 = c(1.25816399608e-6); val c020 = c(-1.17166068530e-5); val c021 = c(4.26100574800e-6)
    val c022 = c(8.60877154770e-7); val c030 = c(7.92796561730e-6); val c031 = c(-9.22650800740e-7)
    val c040 = c(-3.41021874820e-6); val c041 = c(-1.26705833028e-7); val c050 = c(5.07367668140e-7)
    val c100 = c(2.42624687470e-5); val c101 = c(-1.16968865968e-6); val c102 = c(1.08930565545e-6)
    val c103 = c(-4.45885016920e-7); val c110 = c(-9.56770881560e-6); val c111 = c(-1.11398309114e-5)
    val c112 = c(-8.18870887110e-7); val c120 = c(-2.36783083610e-7); val c121 = c(7.82747741600e-7)
    val c130 = c(-3.45587736550e-6); val c131 = c(1.55237776184e-8); val c140 = c(1.29567177830e-6)
    val c200 = c(-3.47924609740e-5); val c201 = c(-9.62445031940e-6); val c202 = c(5.02389113400e-8)
    val c210 = c(1.11008347650e-5); val c211 = c(1.09241497668e-5); val c220 = c(2.92833462950e-6)
    val c221 = c(-1.31462208134e-6); val c230 = c(3.16553060780e-7); val c300 = c(3.74707773050e-5)
    val c301 = c(9.85262139960e-6); val c310 = c(-9.84471178440e-6); val c311 = c(-2.70883712540e-6)
    val c320 = c(-4.88261392000e-7); val c400 = c(-1.73222186120e-5); val c401 = c(-3.56239494540e-6)
    val c410 = c(2.59092252600e-6); val c500 = c(3.09274272530e-6)
    val value = (c000
      + xs*(c100 + xs*(c200 + xs*(c300 + xs*(c400 + c500*xs))))
      + ys*(c010 + xs*(c110 + xs*(c210 + xs*(c310 + c410*xs))) + ys*(c020
      + xs*(c120 + xs*(c220 + c320*xs)) + ys*(c030 + xs*(c130 + c230*xs)
      + ys*(c040 + c140*xs + c050*ys)))) + z*(c001 + xs*(c101 + xs*(c201
      + xs*(c301 + c401*xs))) + ys*(c011 + xs*(c111 + xs*(c211 + c311*xs))
      + ys*(c021 + xs*(c121 + c221*xs) + ys*(c031 + c131*xs + c041*ys)))
      + z*(c002 + xs*(c102 + c202*xs) + ys*(c012 + c112*xs + c022*ys)
      + z*(c003 + c103*xs + c013*ys + z*(c004 + c005*z)))))
    value.t
  }

  /** TEOS-10 sound speed c(SA, CT, p) m/s — `gsw_sound_speed`:
    * c = 10⁴·√(−v²/(∂v/∂p)) over the 75-term polynomial and its
    * analytic pressure derivative — the thermodynamically-consistent
    * replacement for r13's UNESCO formula. Check values (via the
    * reference's own C polynomial): c(34.7118, 28.8099, 10) =
    * 1542.478379390, c(34.8472, 10.2262, 250) = 1494.430077614,
    * c(34.7324, 4.3236, 1000) = 1483.937417670.
    */
  def soundSpeedTeos10(sa: Column, ct: Column, p: Column): Column = {
    val v = specvolG(sa, ct, p)(ColNum)
    lit(10000.0) * sqrt(lit(0.0) - v * v / vPPartG(sa, ct, p)(ColNum))
  }
  def soundSpeedTeos10Sql(sa: String, ct: String, p: String): String = {
    val v = specvolG(s"($sa)", s"($ct)", s"($p)")(SqlNum)
    s"(10000.0 * SQRT(0.0 - ($v) * ($v) / (${vPPartG(s"($sa)", s"($ct)", s"($p)")(SqlNum)})))"
  }

  /** Thermal expansion coefficient α(SA, CT, p) 1/K with respect to
    * Conservative Temperature — TEOS-10 `gsw_alpha`
    * (gsw_oceanographic_toolbox.c:242-265): α = 0.025·(∂v/∂CT)/v over the
    * 75-term polynomial's analytic derivative. Check values (evaluated
    * through the reference's own C polynomial on the standard TEOS-10
    * profile): α(34.7118, 28.8099, 10) = 3.246389345092448e-4,
    * α(34.8472, 10.2262, 250) = 1.731997163447798e-4,
    * α(34.7324, 4.3236, 1000) = 1.294148453345987e-4.
    */
  def alphaTeos10(sa: Column, ct: Column, p: Column): Column =
    alphaG(sa, ct, p)(ColNum)
  def alphaTeos10Sql(sa: String, ct: String, p: String): String =
    alphaG(s"($sa)", s"($ct)", s"($p)")(SqlNum)

  /** Saline (haline) contraction coefficient β(SA, CT, p) kg/g at
    * constant CT and p — TEOS-10 `gsw_beta`
    * (gsw_oceanographic_toolbox.c:386-409): β = −(∂v/∂SA)/v with the
    * chain rule through xs = √(sfac·SA + offset). Check values (via the
    * reference's own C polynomial): β(34.7118, 28.8099, 10) =
    * 7.174839875961353e-4, β(34.8472, 10.2262, 250) =
    * 7.505007517497767e-4, β(34.7324, 4.3236, 1000) =
    * 7.570508133843701e-4.
    */
  def betaTeos10(sa: Column, ct: Column, p: Column): Column =
    betaG(sa, ct, p)(ColNum)
  def betaTeos10Sql(sa: String, ct: String, p: String): String =
    betaG(s"($sa)", s"($ct)", s"($p)")(SqlNum)

  /** Surface spiciness π₀(SA, CT) kg/m³ — TEOS-10 `gsw_spiciness0`
    * (McDougall & Krzysik 2015; reference bundle:
    * gsw_oceanographic_toolbox.c `gsw_spiciness0`), the water-mass
    * variable orthogonal (in the isopycnal sense) to density: warm-salty
    * raises it, cold-fresh lowers it, and it is 0 at standard ocean
    * (SSO, 0 °C) by construction. 7×7 polynomial in
    * (xs = √(sfac·SA + offset), ys = CT/40) with the C's exact Horner
    * nesting, so doubles match the reference bit-for-bit. Check values
    * (via the reference's own polynomial): π₀(34.7118, 28.8099) =
    * 5.728998558542941, π₀(34.8472, 10.2262) = 1.0693625566417637,
    * π₀(34.7324, 4.3236) = 0.08972518849408573, |π₀(35.16504, 0)| <
    * 2e-14.
    */
  private def spiciness0G[T](sa: T, ct: T)(implicit N: Num[T]): T = {
    final class W(val t: T) {
      def +(o: W): W = new W(N.add(t, o.t))
      def *(o: W): W = new W(N.mul(t, o.t))
    }
    def c(v: Double): W = new W(N.const(v))
    val xs = new W(N.sqrtN(N.add(N.mul(N.const(0.0248826675584615), sa),
      N.const(5.971840214030754e-1))))
    val ys = new W(N.mul(ct, N.const(0.025)))
    val s01 = c(-9.22982898371678e1); val s02 = c(-1.35727873628866e1)
    val s03 = c(1.87353650994010e1); val s04 = c(-1.61360047373455e1)
    val s05 = c(3.76112762286425e1); val s06 = c(-4.27086671461257e1)
    val s07 = c(2.00820111041594e1); val s08 = c(2.87969717584045e2)
    val s09 = c(1.13747111959674e1); val s10 = c(6.07377192990680e1)
    val s11 = c(-7.37514033570187e1); val s12 = c(-7.51171878953574e1)
    val s13 = c(1.63310989721504e2); val s14 = c(-8.83222751638095e1)
    val s15 = c(-6.41725302237048e2); val s16 = c(2.79732530789261e1)
    val s17 = c(-2.49466901993728e2); val s18 = c(3.26691295035416e2)
    val s19 = c(2.66389243708181e1); val s20 = c(-2.93170905757579e2)
    val s21 = c(1.76053907144524e2); val s22 = c(8.27634318120224e2)
    val s23 = c(-7.02156220126926e1); val s24 = c(3.82973336590803e2)
    val s25 = c(-5.06206828083959e2); val s26 = c(6.69626565169529e1)
    val s27 = c(3.02851235050766e2); val s28 = c(-1.96345285604621e2)
    val s29 = c(-5.74040806713526e2); val s30 = c(7.03285905478333e1)
    val s31 = c(-2.97870298879716e2); val s32 = c(3.88340373735118e2)
    val s33 = c(-8.29188936089122e1); val s34 = c(-1.87602137195354e2)
    val s35 = c(1.27096944425793e2); val s36 = c(2.11671167892147e2)
    val s37 = c(-3.15140919876285e1); val s38 = c(1.16458864953602e2)
    val s39 = c(-1.50029730802344e2); val s40 = c(3.76293848660589e1)
    val s41 = c(6.47247424373200e1); val s42 = c(-4.47159994408867e1)
    val s43 = c(-3.23533339449055e1); val s44 = c(5.30648562097667)
    val s45 = c(-1.82051249177948e1); val s46 = c(2.33184351090495e1)
    val s47 = c(-6.22909903460368); val s48 = c(-9.55975464301446)
    val s49 = c(6.61877073960113)
    val value = (s01 + ys*(s02 + ys*(s03 + ys*(s04 + ys*(s05 + ys*(s06 + s07*ys)))))
      + xs*(s08 + ys*(s09 + ys*(s10 + ys*(s11 + ys*(s12 + ys*(s13 + s14*ys)))))
      + xs*(s15 + ys*(s16 + ys*(s17 + ys*(s18 + ys*(s19 + ys*(s20 + s21*ys)))))
      + xs*(s22 + ys*(s23 + ys*(s24 + ys*(s25 + ys*(s26 + ys*(s27 + s28*ys)))))
      + xs*(s29 + ys*(s30 + ys*(s31 + ys*(s32 + ys*(s33 + ys*(s34 + s35*ys)))))
      + xs*(s36 + ys*(s37 + ys*(s38 + ys*(s39 + ys*(s40 + ys*(s41 + s42*ys)))))
      + xs*(s43 + ys*(s44 + ys*(s45 + ys*(s46 + ys*(s47 + ys*(s48 + s49*ys)))))
      )))))))
    value.t
  }
  def spiciness0(sa: Column, ct: Column): Column = spiciness0G(sa, ct)(ColNum)
  def spiciness0Sql(sa: String, ct: String): String =
    spiciness0G(s"($sa)", s"($ct)")(SqlNum)

  // --- TEOS-10 vertical stability (gsw/stability.py) --------------------

  /** TEOS-10 buoyancy frequency squared N²(1/s²) between two adjacent
    * profile levels — `Nsquared` (reference bundle: GSW-Python
    * gsw/stability.py:29-90, lat=None branch; the C composes the same
    * quantities per level in gsw_oceanographic_toolbox.c
    * `gsw_nsquared`): with midpoint properties (SA̅, CT̅, p̅) and level
    * differences (ΔSA, ΔCT, Δp),
    *   N² = g²/(v(SA̅,CT̅,p̅)·10⁴·Δp) · (β·ΔSA − α·ΔCT),
    * g = 9.7963 m/s² (Griffies 2004 — stability.py's constant when no
    * latitude is supplied). Positive = stable stratification. Check
    * values (standard TEOS-10 profile, via the reference's own C
    * polynomials): midpoints (30, 87.5, 187.5, 425, 800) dbar →
    * N² = (6.10381482544474901e-5, 2.36472200911899471e-4,
    * 2.17278529580053640e-4, 1.29803654205153541e-5,
    * 8.45888560259768221e-6).
    */
  private def nsquaredG[T](saMid: T, ctMid: T, pMid: T,
      dSa: T, dCt: T, dP: T)(implicit N: Num[T]): T = {
    val g = 9.7963
    N.mul(
      N.div(N.const(g * g),
        N.mul(N.mul(specvolG(saMid, ctMid, pMid), N.const(1e4)), dP)),
      N.sub(N.mul(betaG(saMid, ctMid, pMid), dSa),
        N.mul(alphaG(saMid, ctMid, pMid), dCt)))
  }
  def nsquaredTeos10(saMid: Column, ctMid: Column, pMid: Column,
      dSa: Column, dCt: Column, dP: Column): Column =
    nsquaredG(saMid, ctMid, pMid, dSa, dCt, dP)(ColNum)
  def nsquaredTeos10Sql(saMid: String, ctMid: String, pMid: String,
      dSa: String, dCt: String, dP: String): String =
    nsquaredG(s"($saMid)", s"($ctMid)", s"($pMid)",
      s"($dSa)", s"($dCt)", s"($dP)")(SqlNum)

  /** Turner angle Tu (degrees) at a mid-level — `Turner_Rsubrho`
    * (stability.py:93-146; C: gsw_oceanographic_toolbox.c
    * `gsw_turner_rsubrho`): with ΔSA/ΔCT taken SHALLOW-minus-deep,
    *   Tu = (180/π)·atan2(α·ΔCT + β·ΔSA, α·ΔCT − β·ΔSA).
    * |Tu| < 45° double-stable, 45–90° salt-fingering regime, < −45°
    * diffusive-convection regime. Callers clip SA to [0, 50] first
    * (stability.py:120). Check values (standard profile, reference C):
    * Tu = (-2.06385890528114713, 41.7584352167844273,
    * 47.6069669816875347, 53.7103511517063694, 45.5270638582115339)°.
    */
  private def turnerG[T](saMid: T, ctMid: T, pMid: T,
      dSa: T, dCt: T)(implicit N: Num[T]): T = {
    val a = alphaG(saMid, ctMid, pMid); val b = betaG(saMid, ctMid, pMid)
    N.mul(N.const(180.0 / math.Pi),
      N.atan2N(N.add(N.mul(a, dCt), N.mul(b, dSa)),
        N.sub(N.mul(a, dCt), N.mul(b, dSa))))
  }
  def turnerTeos10(saMid: Column, ctMid: Column, pMid: Column,
      dSa: Column, dCt: Column): Column =
    turnerG(saMid, ctMid, pMid, dSa, dCt)(ColNum)
  def turnerTeos10Sql(saMid: String, ctMid: String, pMid: String,
      dSa: String, dCt: String): String =
    turnerG(s"($saMid)", s"($ctMid)", s"($pMid)", s"($dSa)", s"($dCt)")(SqlNum)

  /** Stability ratio R_ρ = (α·ΔCT)/(β·ΔSA) — the double-diffusion
    * diagnostic paired with Tu (same reference lines). Callers guard
    * ΔSA = 0 (reference returns invalid there). Check values (standard
    * profile, reference C): R_ρ = (-0.930433506903869278,
    * -17.6564834348708892, 21.9627771740757289, 6.52714246620019622,
    * 108.704405467974254).
    */
  private def rsubrhoG[T](saMid: T, ctMid: T, pMid: T,
      dSa: T, dCt: T)(implicit N: Num[T]): T =
    N.div(N.mul(alphaG(saMid, ctMid, pMid), dCt),
      N.mul(betaG(saMid, ctMid, pMid), dSa))
  def rsubrhoTeos10(saMid: Column, ctMid: Column, pMid: Column,
      dSa: Column, dCt: Column): Column =
    rsubrhoG(saMid, ctMid, pMid, dSa, dCt)(ColNum)
  def rsubrhoTeos10Sql(saMid: String, ctMid: String, pMid: String,
      dSa: String, dCt: String): String =
    rsubrhoG(s"($saMid)", s"($ctMid)", s"($pMid)", s"($dSa)", s"($dCt)")(SqlNum)

  /** IPV-to-fN² ratio — `IPV_vs_fNsquared_ratio` (stability.py:148-202;
    * Eqn. 3.20.17 of IOC et al. 2010): the vertical potential-density
    * gradient referenced to p_ref over the locally-referenced one,
    *   ratio = (ΔCT·α(SA̅,CT̅,p_ref) − ΔSA·β(SA̅,CT̅,p_ref)) /
    *           (ΔCT·α(SA̅,CT̅,p̅)    − ΔSA·β(SA̅,CT̅,p̅)),
    * ΔSA/ΔCT SHALLOW-minus-deep, SA clipped [0, 50] by callers
    * (stability.py:179). Identity: p_ref = p̅ ⇒ ratio ≡ 1 (spec-pinned).
    * Callers guard the zero denominator (reference emits NaN there).
    */
  private def ipvFn2G[T](saMid: T, ctMid: T, pMid: T,
      dSa: T, dCt: T, pRef: T)(implicit N: Num[T]): T =
    N.div(
      N.sub(N.mul(dCt, alphaG(saMid, ctMid, pRef)),
        N.mul(dSa, betaG(saMid, ctMid, pRef))),
      N.sub(N.mul(dCt, alphaG(saMid, ctMid, pMid)),
        N.mul(dSa, betaG(saMid, ctMid, pMid))))
  def ipvFn2Teos10(saMid: Column, ctMid: Column, pMid: Column,
      dSa: Column, dCt: Column, pRef: Column): Column =
    ipvFn2G(saMid, ctMid, pMid, dSa, dCt, pRef)(ColNum)
  def ipvFn2Teos10Sql(saMid: String, ctMid: String, pMid: String,
      dSa: String, dCt: String, pRef: String): String =
    ipvFn2G(s"($saMid)", s"($ctMid)", s"($pMid)",
      s"($dSa)", s"($dCt)", s"($pRef)")(SqlNum)

  /** The locally-referenced denominator of [[ipvFn2Teos10]], exposed so
    * queries can replicate the reference's NaN-on-zero-denominator guard
    * engine-identically (both sides test the same double against 0).
    */
  def ipvFn2DenTeos10(saMid: Column, ctMid: Column, pMid: Column,
      dSa: Column, dCt: Column): Column =
    ColNum.sub(ColNum.mul(dCt, alphaG(saMid, ctMid, pMid)(ColNum)),
      ColNum.mul(dSa, betaG(saMid, ctMid, pMid)(ColNum)))
  def ipvFn2DenTeos10Sql(saMid: String, ctMid: String, pMid: String,
      dSa: String, dCt: String): String = {
    implicit val N: Num[String] = SqlNum
    N.sub(N.mul(s"($dCt)", alphaG(s"($saMid)", s"($ctMid)", s"($pMid)")),
      N.mul(s"($dSa)", betaG(s"($saMid)", s"($ctMid)", s"($pMid)")))
  }
}
