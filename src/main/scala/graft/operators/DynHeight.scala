package graft.operators

import graft.Det
import graft.functions.Seawater
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-fidelity dynamic height anomaly — the full
  * `geo_strf_dyn_height` path of GSW-Python (geostrophy.py:17-102 wrapper
  * + the C kernel gsw_geo_strf_dyn_height_1,
  * gsw_oceanographic_toolbox.c:4111-4279), re-expressed as one
  * declarative per-profile plan instead of the reference's per-profile
  * Python loop:
  *
  *   - p_ref-referenced: Ψ(p) = −∫_{p_ref}^{p} v_anom dp with
  *     v_anom = gsw_specvol_anom_standard (trapezoid rule over the
  *     integration grid, exactly the C's `dh[i] = dh[i-1] −
  *     0.5·(b[i]+b[i-1])·dp·db2pa` recurrence, then the value at p_ref
  *     subtracted out).
  *   - Surface-extension branch (geostrophy.py:84-91): when the
  *     shallowest sample sits below p_ref, the profile is temporarily
  *     extended upward with arange(p_ref, p[0], max_dp) carrying the
  *     shallowest SA/CT (mixed-layer assumption); extension rows are
  *     dropped from the output.
  *   - max_dp regridding branch (refine_grid_for_dh, toolbox.c:4020-4074):
  *     unless every pressure gap is ≤ max_dp AND a sample sits exactly at
  *     p_ref (the C's no-interpolation fast path, toolbox.c:4162-4190),
  *     the grid is refined with uniform candidates p[0] + i·max_dp plus
  *     p_ref itself, and SA/CT are interpolated onto the new points by
  *     `interpMethod`: "linear" (linear_interp_SA_CT_for_dh,
  *     toolbox.c:4081-4108) or "pchip" — the reference's DEFAULT
  *     (geostrophy.py:18 `interp_method='pchip'`) — the shape-preserving
  *     Fritsch–Carlson monotone cubic Hermite of gsw_util_pchip_interp
  *     (toolbox.c:11147-11306): per-knot derivatives from the weighted
  *     harmonic mean of bracketing slopes (zero at local extrema, the
  *     one-sided edge rule at endpoints, plain slope for 2-point
  *     profiles), then Hermite basis evaluation on each bracketed grid
  *     point. Derivatives need only bracketing knots, so they are one
  *     extra lag/lead window pass over the known rows — still keyed on
  *     pid, still join-free.
  *   - Skip semantics (geostrophy.py:79-81): profiles with fewer than two
  *     good levels or with p_ref below the deepest sample yield NULL at
  *     every level (the reference fills NaN). DOCUMENTED DEVIATION:
  *     non-monotone p also yields per-profile NULL where the reference
  *     raises ValueError for the whole batch — a column-friendly
  *     per-profile quarantine instead of a job abort.
  *
  * Scale shape: every window partitions on the profile id, so the whole
  * computation is keyed exchanges on `pid` (stats pass + post-union grid
  * pass) with the per-profile grid at most nlev + (p_max−p_min)/max_dp
  * rows — no joins, no driver loops, grids never leave their partition.
  *
  * Determinism: the trapezoid terms are floor-quantized to integer
  * 1e-`unitScale` units (pure IEEE double ops, identical bits on every
  * engine) and summed as longs — order-free and engine-exact — then the
  * p_ref value is subtracted in integer units and the result emitted as
  * a `Det.qz(·, outScale)` double. The caller's SQL twin mirrors the
  * identical arithmetic.
  *
  * Grid-value caveat (documented): the C skips uniform candidates within
  * p_tol = 0.001·max_dp of an original point; this plan drops only EXACT
  * collisions. Callers must keep distinct grid values separated by more
  * than p_tol (any data with ≥ 0.01-dbar spacing at max_dp = 1 qualifies;
  * the registry synthesis uses integer-valued pressures).
  *
  * Input columns: pid (profile key), lvl (level id, echoed), p, sa, ct.
  * Output: (pid, lvl, dyn_height) with dyn_height NULL on skipped
  * profiles.
  */
object DynHeight {

  private type Col = org.apache.spark.sql.Column

  /** The C's pchip_derivs for one knot attribute, expressed over lag/lead
    * pairs (toolbox.c:11175-11231). All divisions sit inside the branch
    * that guarantees their denominators non-zero (gaps are positive on
    * valid profiles; the harmonic-mean denominator is a same-sign sum of
    * non-zero terms), so ANSI mode never faults.
    */
  private def pchipD(pg: Col, y: Col, w: org.apache.spark.sql.expressions.WindowSpec): Col = {
    val (pgm1, pgm2) = (lag(pg, 1).over(w), lag(pg, 2).over(w))
    val (pgp1, pgp2) = (lead(pg, 1).over(w), lead(pg, 2).over(w))
    val (ym1, ym2) = (lag(y, 1).over(w), lag(y, 2).over(w))
    val (yp1, yp2) = (lead(y, 1).over(w), lead(y, 2).over(w))
    val hm = pg - pgm1
    val hp = pgp1 - pg
    val mm = (y - ym1) / hm
    val mp = (yp1 - y) / hp
    // pchip_edge_case(h0, h1, m0, m1), toolbox.c:11147-11164
    def edge(h0: Col, h1: Col, m0: Col, m1: Col): Col = {
      val d = ((lit(2.0) * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
      when(signum(d) =!= signum(m0), 0.0)
        .when(signum(m0) =!= signum(m1) && abs(d) > lit(3.0) * abs(m0),
          lit(3.0) * m0)
        .otherwise(d)
    }
    val interior =
      when(signum(mm) =!= signum(mp) || mp === 0.0 || mm === 0.0, 0.0)
        .otherwise {
          val w1 = lit(2.0) * hp + hm
          val w2 = hp + lit(2.0) * hm
          (w1 + w2) / (w1 / mm + w2 / mp)
        }
    when(pgm1.isNull && pgp2.isNull, mp) // n == 2, first knot
      .when(pgp1.isNull && pgm2.isNull, mm) // n == 2, last knot
      .when(pgm1.isNull, // first knot of n >= 3
        edge(hp, pgp2 - pgp1, mp, (yp2 - yp1) / (pgp2 - pgp1)))
      .when(pgp1.isNull, // last knot of n >= 3
        edge(hm, pgm1 - pgm2, mm, (ym1 - ym2) / (pgm1 - pgm2)))
      .otherwise(interior)
  }

  def perProfile(levels: DataFrame, pRef: Double, maxDp: Double,
      unitScale: Int = 12, outScale: Int = 6,
      interpMethod: String = "linear"): DataFrame = {
    require(interpMethod == "linear" || interpMethod == "pchip",
      s"interpMethod must be linear or pchip, got '$interpMethod'")
    val pchip = interpMethod == "pchip"
    val lvlType = levels.schema("lvl").dataType
    val unit = math.pow(10, unitScale)

    val wAll = Window.partitionBy("pid")
    val wOrd = Window.partitionBy("pid").orderBy("p")

    val stat = levels
      .withColumn("gap", col("p") - lag(col("p"), 1).over(wOrd))
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("nlev", count(lit(1)).over(wAll))
      .withColumn("p0", min(col("p")).over(wAll))
      .withColumn("pmax", max(col("p")).over(wAll))
      .withColumn("hasref",
        max(when(col("p") === pRef, 1).otherwise(0)).over(wAll))
      .withColumn("gapmax", max(col("gap")).over(wAll))
      .withColumn("gapmin", min(col("gap")).over(wAll))
      .withColumn("valid",
        col("nlev") >= 2 && col("pmax") >= pRef && col("gapmin") > 0.0)
      .withColumn("fastpath",
        col("gapmax") <= maxDp && (col("p0") > pRef || col("hasref") === 1))

    val orig = stat.select(col("pid"), col("lvl"), col("p").as("pg"),
      col("sa"), col("ct"), lit(true).as("known"), lit(true).as("is_orig"),
      col("valid"))

    // Shape note (round-18 A/B, REVERTED): generating the WHOLE grid
    // from one stats subtree — every row explodes to itself plus, on the
    // designated row, all aux rows (pchip: two Generate passes
    // bracketing the derivative windows, pending unknowns riding the
    // designated knot row) — collapses the plan to ONE pid exchange and
    // one scan (committed as plans/r18/*_attempt_single_subtree.txt) but
    // measured WORSE where it matters: isolated 3-round alternating A/B
    // at sf1.0 gave r39 4.2-5.8 s → 6.2-11.2 s (+50-90%) and r38
    // 2.9-3.6 → 3.4-5.1 s (+15-55%) (sf0.1 was flat-to-better, masking
    // it). The per-row cost of array(struct(...))+concat+explode over
    // EVERY input row — paid twice for pchip — scales with the corpus,
    // while the exchanges it removes are cheap local shuffles; the
    // union shape only builds aux arrays on the ~1/nlev designated
    // rows. Guide §1.1's gotcha clause in action: the "ideal" plan
    // lost to the one that keeps the hot path projection-only.
    //
    // one designated (shallowest) row per valid profile generates ALL
    // auxiliary grid rows as one exploded array (its own sa/ct ARE the
    // surface-extension fill) — a single extra branch over the stats
    // subtree instead of three, so the input is scanned twice total
    val shal = stat.filter(col("rn") === 1 && col("valid"))
    val gridType = "array<struct<pg:double,sa:double,ct:double,known:boolean>>"
    def guarded(cond: org.apache.spark.sql.Column,
        arr: org.apache.spark.sql.Column) =
      coalesce(when(cond, arr), array().cast(gridType))
    // arange(p_ref, p[0], max_dp) — stop exclusive, count = ceil(span/dp)
    val extArr = guarded(col("p0") > pRef,
      transform(sequence(lit(0),
        ceil((col("p0") - pRef) / maxDp).cast("int") - 1),
        i => struct((lit(pRef) + i.cast("double") * maxDp).as("pg"),
          col("sa").as("sa"), col("ct").as("ct"), lit(true).as("known"))))
    // uniform refinement candidates anchor + i·max_dp with anchor the
    // post-extension p[0] = min(p0, p_ref); interior only. pg ≤ p0
    // duplicates the extension lattice (same anchor, same spacing) and
    // pg = p_ref duplicates the pref row — both excluded here so no
    // aux-aux dedup pass is needed downstream
    val anchor = least(col("p0"), lit(pRef))
    val candArr = guarded(!col("fastpath"),
      transform(
        filter(
          transform(sequence(lit(1),
            ceil((col("pmax") - anchor) / maxDp).cast("int")),
            i => anchor + i.cast("double") * maxDp),
          pg => pg > col("p0") && pg < col("pmax") && pg =!= pRef),
        pg => struct(pg.as("pg"), lit(null).cast("double").as("sa"),
          lit(null).cast("double").as("ct"), lit(false).as("known"))))
    // p_ref itself when it falls strictly inside the profile
    val prefArr = guarded(col("p0") < pRef,
      array(struct(lit(pRef).as("pg"), lit(null).cast("double").as("sa"),
        lit(null).cast("double").as("ct"), lit(false).as("known"))))
    def auxRows(arr: org.apache.spark.sql.Column) = shal
      .select(col("pid"), explode(arr).as("g"))
      .select(col("pid"), lit(null).cast(lvlType).as("lvl"),
        col("g.pg").as("pg"), col("g.sa").as("sa"), col("g.ct").as("ct"),
        col("g.known").as("known"), lit(false).as("is_orig"),
        lit(true).as("valid"))
    val grid = if (!pchip) {
      orig.unionByName(auxRows(concat(extArr, candArr, prefArr)))
    } else {
      // pchip derivatives live on the KNOTS (originals + surface
      // extension — exactly the array the C differentiates after the
      // wrapper prepends the mixed layer); one extra lag/lead window
      // pass over known rows, still keyed on pid, before the unknown
      // grid points union in for the carry/Hermite pass.
      val wK = Window.partitionBy("pid").orderBy("pg")
      val knots = orig.unionByName(auxRows(extArr))
        .withColumn("d_sa", when(col("valid"), pchipD(col("pg"), col("sa"), wK)))
        .withColumn("d_ct", when(col("valid"), pchipD(col("pg"), col("ct"), wK)))
      knots.unionByName(auxRows(concat(candArr, prefArr))
        .withColumn("d_sa", lit(null).cast("double"))
        .withColumn("d_ct", lit(null).cast("double")))
    }

    // linear SA/CT interpolation between the bracketing known points —
    // the C's sa[i-1] + pfac*(sa[i]-sa[i-1]) with pfac a single division.
    // Ties (an aux candidate exactly on an original point) sort AFTER the
    // known row and are dropped by the pk_prev = pg filter below, the
    // carry-based equivalent of the C's p_tol skip for exact collisions —
    // original rows always survive, so invalid profiles keep every level.
    val wPrev = Window.partitionBy("pid").orderBy(col("pg"), col("known").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("pid").orderBy(col("pg"), col("known").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def carryPrev(c: org.apache.spark.sql.Column) =
      last(when(col("known"), c), ignoreNulls = true).over(wPrev)
    def carryNext(c: org.apache.spark.sql.Column) =
      first(when(col("known"), c), ignoreNulls = true).over(wNext)
    val carried = grid
      .withColumn("pk_prev", carryPrev(col("pg")))
      .withColumn("sa_prev", carryPrev(col("sa")))
      .withColumn("ct_prev", carryPrev(col("ct")))
      .withColumn("pk_next", carryNext(col("pg")))
      .withColumn("sa_next", carryNext(col("sa")))
      .withColumn("ct_next", carryNext(col("ct")))
    val carried2 = if (!pchip) carried else carried
      .withColumn("dsa_prev", carryPrev(col("d_sa")))
      .withColumn("dct_prev", carryPrev(col("d_ct")))
      .withColumn("dsa_next", carryNext(col("d_sa")))
      .withColumn("dct_next", carryNext(col("d_ct")))
    // Hermite basis evaluation between the bracketing knots — the C's
    // gsw_util_pchip_interp inner loop (toolbox.c:11287-11297), with t
    // the same pfac the linear branch uses.
    def hermite(yp: Col, yn: Col, dp_ : Col, dn: Col): Col = {
      val dx = col("pk_next") - col("pk_prev")
      val t = col("pfac")
      val tt = t * t
      val ttt = tt * t
      val h00 = lit(2.0) * ttt - lit(3.0) * tt + lit(1.0)
      val h10 = ttt - lit(2.0) * tt + t
      val h01 = lit(-2.0) * ttt + lit(3.0) * tt
      val h11 = ttt - tt
      yp * h00 + dp_ * dx * h10 + yn * h01 + dn * dx * h11
    }
    def interp1(y: String): Col = {
      val lin = col(s"${y}_prev") +
        col("pfac") * (col(s"${y}_next") - col(s"${y}_prev"))
      when(col("known"), col(y)).otherwise(
        if (pchip) hermite(col(s"${y}_prev"), col(s"${y}_next"),
          col(s"d${y}_prev"), col(s"d${y}_next"))
        else lin)
    }
    val interp = carried2
      .filter(col("known") || col("pk_prev") =!= col("pg"))
      // guard: only unknown rows divide (known rows have pk_prev = pg =
      // pk_next and ANSI mode faults on the dead branch if unconditional)
      .withColumn("pfac", when(!col("known"),
        (col("pg") - col("pk_prev")) / (col("pk_next") - col("pk_prev"))))
      .withColumn("sa_i", interp1("sa"))
      .withColumn("ct_i", interp1("ct"))

    // trapezoid recurrence in integer 1e-unitScale units: term_i =
    // −0.5·(b_i + b_{i−1})·Δp·db2pa, floor-quantized then long-summed
    val wg = Window.partitionBy("pid").orderBy("pg")
    val wgCum = wg.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = interp
      .withColumn("b", Seawater.svanStandard(col("sa_i"), col("ct_i"), col("pg")))
      .withColumn("term_u", when(lag(col("pg"), 1).over(wg).isNotNull,
        floor((lit(0.0) - lit(0.5) * (col("b") + lag(col("b"), 1).over(wg)) *
          (col("pg") - lag(col("pg"), 1).over(wg)) * 1e4) * unit + 0.5)
          .cast("long")))
      .withColumn("dh_u", coalesce(sum(col("term_u")).over(wgCum), lit(0L)))
      .withColumn("dhref_u",
        max(when(col("pg") === pRef, col("dh_u"))).over(wAll))

    scored.filter(col("is_orig"))
      .select(col("pid"), col("lvl"),
        when(col("valid"),
          Det.qz((col("dh_u") - col("dhref_u")).cast("double") / unit, outScale))
          .as("dyn_height"))
  }

  /** The SQL text of [[pchipD]] for knot attribute `y` over named window
    * `wk` — structurally identical arithmetic so IEEE doubles agree
    * bit-for-bit with the Spark side.
    */
  private def pchipDSql(y: String): String = {
    def lg(c: String, k: Int) = s"lag($c, $k) OVER wk"
    def ld(c: String, k: Int) = s"lead($c, $k) OVER wk"
    val hm = s"(pg - ${lg("pg", 1)})"
    val hp = s"(${ld("pg", 1)} - pg)"
    val mm = s"(($y - ${lg(y, 1)}) / $hm)"
    val mp = s"((${ld(y, 1)} - $y) / $hp)"
    def edge(h0: String, h1: String, m0: String, m1: String): String = {
      val d = s"((((2.0 * $h0) + $h1) * $m0 - $h0 * $m1) / ($h0 + $h1))"
      s"""CASE WHEN sign($d) <> sign($m0) THEN 0.0
              WHEN sign($m0) <> sign($m1) AND abs($d) > 3.0 * abs($m0)
                THEN 3.0 * $m0
              ELSE $d END"""
    }
    val w1 = s"((2.0 * $hp) + $hm)"
    val w2 = s"($hp + (2.0 * $hm))"
    val interior =
      s"""CASE WHEN sign($mm) <> sign($mp) OR $mp = 0.0 OR $mm = 0.0 THEN 0.0
              ELSE (($w1 + $w2) / (($w1 / $mm) + ($w2 / $mp))) END"""
    val h1p = s"(${ld("pg", 2)} - ${ld("pg", 1)})"
    val m1p = s"((${ld(y, 2)} - ${ld(y, 1)}) / $h1p)"
    val h1m = s"(${lg("pg", 1)} - ${lg("pg", 2)})"
    val m1m = s"((${lg(y, 1)} - ${lg(y, 2)}) / $h1m)"
    s"""CASE WHEN ${lg("pg", 1)} IS NULL AND ${ld("pg", 2)} IS NULL THEN $mp
            WHEN ${ld("pg", 1)} IS NULL AND ${lg("pg", 2)} IS NULL THEN $mm
            WHEN ${lg("pg", 1)} IS NULL THEN ${edge(hp, h1p, mp, m1p)}
            WHEN ${ld("pg", 1)} IS NULL THEN ${edge(hm, h1m, mm, m1m)}
            ELSE $interior END"""
  }

  /** DuckDB twin of [[perProfile]] — identical arithmetic over the same
    * constants; `lvlTable` must expose (pid, lvl, p, sa, ct).
    */
  def perProfileSql(lvlTable: String, pRef: Double, maxDp: Double,
      unitScale: Int = 12, outScale: Int = 6,
      interpMethod: String = "linear"): String = {
    require(interpMethod == "linear" || interpMethod == "pchip",
      s"interpMethod must be linear or pchip, got '$interpMethod'")
    val pchip = interpMethod == "pchip"
    val pR = s"%.17e".format(pRef)
    val dp = s"%.17e".format(maxDp)
    val unit = s"1e$unitScale"
    val svan = Seawater.svanStandardSql("sa_i", "ct_i", "pg")
    s"""
      WITH lvls AS (SELECT pid, lvl, p, sa, ct FROM ($lvlTable)),
      stat AS (
        SELECT *,
               COUNT(*) OVER wa AS nlev,
               MIN(p) OVER wa AS p0, MAX(p) OVER wa AS pmax,
               MAX(CASE WHEN p = $pR THEN 1 ELSE 0 END) OVER wa AS hasref,
               MAX(gap) OVER wa AS gapmax, MIN(gap) OVER wa AS gapmin,
               row_number() OVER wo AS rn
        FROM (SELECT *, p - lag(p) OVER (PARTITION BY pid ORDER BY p) AS gap
              FROM lvls)
        WINDOW wa AS (PARTITION BY pid),
               wo AS (PARTITION BY pid ORDER BY p)),
      stat2 AS (
        SELECT *,
               (nlev >= 2 AND pmax >= $pR AND gapmin > 0.0) AS valid,
               (gapmax <= $dp AND (p0 > $pR OR hasref = 1)) AS fastpath
        FROM stat),
      orig AS (
        SELECT pid, lvl, p AS pg, sa, ct, TRUE AS known, TRUE AS is_orig, valid
        FROM stat2),
      shal AS (SELECT * FROM stat2 WHERE rn = 1 AND valid),
      ext AS (
        SELECT pid, NULL AS lvl,
               $pR + CAST(unnest(generate_series(0,
                 CAST(CEIL((p0 - $pR) / $dp) AS INT) - 1)) AS DOUBLE) * $dp AS pg,
               sa, ct, TRUE AS known, FALSE AS is_orig, TRUE AS valid
        FROM shal WHERE p0 > $pR),
      cand0 AS (
        SELECT pid, p0, pmax, LEAST(p0, $pR) AS anchor,
               CAST(unnest(generate_series(1,
                 CAST(CEIL((pmax - LEAST(p0, $pR)) / $dp) AS INT))) AS DOUBLE) AS i
        FROM shal WHERE NOT fastpath),
      cand AS (
        SELECT pid, NULL AS lvl, anchor + i * $dp AS pg,
               CAST(NULL AS DOUBLE) AS sa, CAST(NULL AS DOUBLE) AS ct,
               FALSE AS known, FALSE AS is_orig, TRUE AS valid
        FROM cand0
        WHERE anchor + i * $dp > p0 AND anchor + i * $dp < pmax
          AND anchor + i * $dp <> $pR),
      pref AS (
        SELECT pid, NULL AS lvl, $pR AS pg,
               CAST(NULL AS DOUBLE) AS sa, CAST(NULL AS DOUBLE) AS ct,
               FALSE AS known, FALSE AS is_orig, TRUE AS valid
        FROM shal WHERE p0 < $pR),
      ${if (!pchip) s"""
      grid AS (
        SELECT pid, lvl, pg, sa, ct, known, is_orig, valid FROM orig
        UNION ALL SELECT pid, lvl, pg, sa, ct, known, is_orig, valid FROM ext
        UNION ALL SELECT pid, lvl, pg, sa, ct, known, is_orig, valid FROM cand
        UNION ALL SELECT pid, lvl, pg, sa, ct, known, is_orig, valid FROM pref),"""
      else s"""
      knots AS (
        SELECT pid, lvl, pg, sa, ct, known, is_orig, valid FROM orig
        UNION ALL SELECT pid, lvl, pg, sa, ct, known, is_orig, valid FROM ext),
      kd AS (
        SELECT *,
               CASE WHEN valid THEN ${pchipDSql("sa")} END AS d_sa,
               CASE WHEN valid THEN ${pchipDSql("ct")} END AS d_ct
        FROM knots
        WINDOW wk AS (PARTITION BY pid ORDER BY pg)),
      grid AS (
        SELECT pid, lvl, pg, sa, ct, known, is_orig, valid, d_sa, d_ct FROM kd
        UNION ALL SELECT pid, lvl, pg, sa, ct, known, is_orig, valid,
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM cand
        UNION ALL SELECT pid, lvl, pg, sa, ct, known, is_orig, valid,
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM pref),"""}
      interp AS (
        SELECT *,
               ${if (!pchip) """
               CASE WHEN known THEN sa ELSE sa_prev +
                 ((pg - pk_prev) / (pk_next - pk_prev)) * (sa_next - sa_prev)
               END AS sa_i,
               CASE WHEN known THEN ct ELSE ct_prev +
                 ((pg - pk_prev) / (pk_next - pk_prev)) * (ct_next - ct_prev)
               END AS ct_i"""
               else {
                 // Hermite text mirrors the Column tree in perProfile:
                 // t = pfac, tt = t*t, ttt = tt*t, left-assoc sums.
                 val t = "((pg - pk_prev) / (pk_next - pk_prev))"
                 val tt = s"($t * $t)"
                 val ttt = s"($tt * $t)"
                 val h00 = s"((2.0 * $ttt - 3.0 * $tt) + 1.0)"
                 val h10 = s"(($ttt - 2.0 * $tt) + $t)"
                 val h01 = s"(-2.0 * $ttt + 3.0 * $tt)"
                 val h11 = s"($ttt - $tt)"
                 def herm(y: String) =
                   s"""CASE WHEN known THEN $y ELSE
                       ${y}_prev * $h00 + d${y}_prev * (pk_next - pk_prev) * $h10
                       + ${y}_next * $h01 + d${y}_next * (pk_next - pk_prev) * $h11
                     END AS ${y}_i"""
                 s"${herm("sa")},\n               ${herm("ct")}"
               }}
        FROM (
          SELECT *,
                 LAST_VALUE(CASE WHEN known THEN pg END IGNORE NULLS) OVER wp AS pk_prev,
                 LAST_VALUE(CASE WHEN known THEN sa END IGNORE NULLS) OVER wp AS sa_prev,
                 LAST_VALUE(CASE WHEN known THEN ct END IGNORE NULLS) OVER wp AS ct_prev,
                 FIRST_VALUE(CASE WHEN known THEN pg END IGNORE NULLS) OVER wn AS pk_next,
                 FIRST_VALUE(CASE WHEN known THEN sa END IGNORE NULLS) OVER wn AS sa_next,
                 FIRST_VALUE(CASE WHEN known THEN ct END IGNORE NULLS) OVER wn AS ct_next${
            if (!pchip) "" else """,
                 LAST_VALUE(CASE WHEN known THEN d_sa END IGNORE NULLS) OVER wp AS dsa_prev,
                 LAST_VALUE(CASE WHEN known THEN d_ct END IGNORE NULLS) OVER wp AS dct_prev,
                 FIRST_VALUE(CASE WHEN known THEN d_sa END IGNORE NULLS) OVER wn AS dsa_next,
                 FIRST_VALUE(CASE WHEN known THEN d_ct END IGNORE NULLS) OVER wn AS dct_next"""}
          FROM grid
          WINDOW wp AS (PARTITION BY pid ORDER BY pg, known DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wn AS (PARTITION BY pid ORDER BY pg, known DESC
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        WHERE known OR pk_prev <> pg),
      scored AS (
        SELECT *,
               MAX(CASE WHEN pg = $pR THEN dh_u END)
                 OVER (PARTITION BY pid) AS dhref_u
        FROM (
          SELECT *, COALESCE(CAST(SUM(term_u) OVER
                   (PARTITION BY pid ORDER BY pg
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT), 0) AS dh_u
          FROM (
            SELECT *, CASE WHEN lag(pg) OVER wo IS NOT NULL THEN
                     CAST(FLOOR((0.0 - 0.5 * (b + lag(b) OVER wo) *
                       (pg - lag(pg) OVER wo) * 1e4) * $unit + 0.5) AS BIGINT)
                   END AS term_u
            FROM (SELECT *, ($svan) AS b FROM interp)
            WINDOW wo AS (PARTITION BY pid ORDER BY pg))))
      SELECT pid, lvl,
             CASE WHEN valid THEN
               ${Det.qzSql(s"CAST(dh_u - dhref_u AS DOUBLE) / $unit", outScale)}
             END AS dyn_height
      FROM scored WHERE is_orig"""
  }
}
