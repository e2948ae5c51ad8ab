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
  *     p_ref itself, and SA/CT are linearly interpolated onto the new
  *     points (linear_interp_SA_CT_for_dh, toolbox.c:4081-4108 — the
  *     interp_method='linear' branch; pchip not offered).
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

  def perProfile(levels: DataFrame, pRef: Double, maxDp: Double,
      unitScale: Int = 12, outScale: Int = 6): DataFrame = {
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
    val aux = shal
      .select(col("pid"), explode(concat(extArr, candArr, prefArr)).as("g"))
      .select(col("pid"), lit(null).cast(lvlType).as("lvl"),
        col("g.pg").as("pg"), col("g.sa").as("sa"), col("g.ct").as("ct"),
        col("g.known").as("known"), lit(false).as("is_orig"),
        lit(true).as("valid"))
    val grid = orig.unionByName(aux)

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
    val interp = grid
      .withColumn("pk_prev", carryPrev(col("pg")))
      .withColumn("sa_prev", carryPrev(col("sa")))
      .withColumn("ct_prev", carryPrev(col("ct")))
      .withColumn("pk_next", carryNext(col("pg")))
      .withColumn("sa_next", carryNext(col("sa")))
      .withColumn("ct_next", carryNext(col("ct")))
      .filter(col("known") || col("pk_prev") =!= col("pg"))
      // guard: only unknown rows divide (known rows have pk_prev = pg =
      // pk_next and ANSI mode faults on the dead branch if unconditional)
      .withColumn("pfac", when(!col("known"),
        (col("pg") - col("pk_prev")) / (col("pk_next") - col("pk_prev"))))
      .withColumn("sa_i", when(col("known"), col("sa"))
        .otherwise(col("sa_prev") + col("pfac") * (col("sa_next") - col("sa_prev"))))
      .withColumn("ct_i", when(col("known"), col("ct"))
        .otherwise(col("ct_prev") + col("pfac") * (col("ct_next") - col("ct_prev"))))

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

  /** DuckDB twin of [[perProfile]] — identical arithmetic over the same
    * constants; `lvlTable` must expose (pid, lvl, p, sa, ct).
    */
  def perProfileSql(lvlTable: String, pRef: Double, maxDp: Double,
      unitScale: Int = 12, outScale: Int = 6): String = {
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
      grid AS (
        SELECT pid, lvl, pg, sa, ct, known, is_orig, valid FROM orig
        UNION ALL SELECT pid, lvl, pg, sa, ct, known, is_orig, valid FROM ext
        UNION ALL SELECT pid, lvl, pg, sa, ct, known, is_orig, valid FROM cand
        UNION ALL SELECT pid, lvl, pg, sa, ct, known, is_orig, valid FROM pref),
      interp AS (
        SELECT *,
               CASE WHEN known THEN sa ELSE sa_prev +
                 ((pg - pk_prev) / (pk_next - pk_prev)) * (sa_next - sa_prev)
               END AS sa_i,
               CASE WHEN known THEN ct ELSE ct_prev +
                 ((pg - pk_prev) / (pk_next - pk_prev)) * (ct_next - ct_prev)
               END AS ct_i
        FROM (
          SELECT *,
                 LAST_VALUE(CASE WHEN known THEN pg END IGNORE NULLS) OVER wp AS pk_prev,
                 LAST_VALUE(CASE WHEN known THEN sa END IGNORE NULLS) OVER wp AS sa_prev,
                 LAST_VALUE(CASE WHEN known THEN ct END IGNORE NULLS) OVER wp AS ct_prev,
                 FIRST_VALUE(CASE WHEN known THEN pg END IGNORE NULLS) OVER wn AS pk_next,
                 FIRST_VALUE(CASE WHEN known THEN sa END IGNORE NULLS) OVER wn AS sa_next,
                 FIRST_VALUE(CASE WHEN known THEN ct END IGNORE NULLS) OVER wn AS ct_next
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
