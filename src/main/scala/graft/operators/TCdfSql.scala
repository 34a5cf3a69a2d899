package graft.operators

/** DuckDB SQL for the two-sided Student-t p-value — the oracle-side twin of
  * [[graft.functions.WelchTTest]] (which delegates to commons-math's
  * `TDistribution`, the JVM analogue of the reference's
  * `scipy.stats.ttest_ind_from_stats` call, main/mwas_general.py:410-412).
  *
  * Why this exists: the t-CDF kept the flagship pipeline output and
  * `q23_welch_full` rows-only for eight rounds — DuckDB has no Student-t /
  * incomplete-beta builtin, so `p_value` could never be hash-compared. But
  * the two-sided p is exactly the regularized incomplete beta
  *
  *     p = I_x(df/2, 1/2),   x = df / (df + t²),
  *
  * and DuckDB has `lgamma`, `exp`, `ln` and recursive CTEs — enough to
  * evaluate I_x by the standard continued fraction (modified Lentz, the
  * `betacf` formulation of Numerical Recipes §6.4; the same fraction
  * commons-math evaluates). Both engines then compute the same well-
  * conditioned special function independently; measured agreement on the
  * suite's real (t, df) range (df up to ~8×10³) is ≤ 7×10⁻¹² absolute on
  * p ∈ [0,1] — ulp-class drift as far as the driver's value normalization
  * is concerned (the same class as every unrounded drifting aggregate that
  * has hash-matched since round 1), with convergence in ≤ 50 iterations
  * against the fixed 200-iteration cap.
  *
  * Numerical notes, each load-bearing:
  *   - Every anchor column of the recursive CTE is cast to DOUBLE: a
  *     recursive CTE's column types are fixed by the ANCHOR member, and a
  *     bare `1.0` literal is DECIMAL(2,1) in DuckDB — an un-cast seed
  *     silently quantizes the Lentz `c` state to one decimal digit per
  *     iteration (observed: p wrong at 1e-2 before the cast).
  *   - `x` and `1−x` are both formed as direct ratios (`df/(df+t²)`,
  *     `t²/(df+t²)`) rather than via subtraction, so the `ln` arguments
  *     carry no cancellation error near x ≈ 1 (small |t|, the common case).
  *   - The symmetry swap I_x(a,b) = 1 − I_{1−x}(b,a) is applied when
  *     x ≥ (a+1)/(a+b+2), keeping the fraction in its fast-converging
  *     region (identical policy to Numerical Recipes and commons-math).
  *   - Iteration stops per-row once |δ−1| < 1e-15 (rows leave the
  *     recursion; `arg_max(h, m)` recovers each row's converged state), so
  *     converged rows cannot accumulate post-convergence drift.
  */
object TCdfSql {

  /** The CTE chain, to splice into a `WITH RECURSIVE` list after a CTE
    * named `tdf_in` providing `keys`, `t` (the statistic) and `df`
    * (degrees of freedom, > 0). Ends with `tcdf_p`, carrying `keys`, `t`,
    * `df` and `p_cf` (two-sided p; NULL never appears — rows with NULL
    * t/df are simply absent, so consumers LEFT JOIN on `keys`).
    *
    * Keys must be unique per row and NULL-free (they drive the
    * per-row recursion state and the join back).
    */
  def fragment(keys: Seq[String], maxIter: Int = 200): String = {
    val K = keys.mkString(", ")
    s"""tcdf_base AS (
       |  SELECT $K, t, df,
       |         df/(df + t*t) AS x,
       |         (t*t)/(df + t*t) AS x1m,
       |         df/2.0 AS a, CAST(0.5 AS DOUBLE) AS b
       |  FROM tdf_in WHERE t IS NOT NULL AND df IS NOT NULL),
       |tcdf_sw AS (
       |  SELECT $K, t, df,
       |         x >= (a+1.0)/(a+b+2.0) AS swapped,
       |         CASE WHEN x >= (a+1.0)/(a+b+2.0) THEN b ELSE a END AS ca,
       |         CASE WHEN x >= (a+1.0)/(a+b+2.0) THEN a ELSE b END AS cb,
       |         CASE WHEN x >= (a+1.0)/(a+b+2.0) THEN x1m ELSE x END AS cx,
       |         CASE WHEN x >= (a+1.0)/(a+b+2.0) THEN x ELSE x1m END AS cx1m
       |  FROM tcdf_base),
       |tcdf_cf AS (
       |  -- modified-Lentz state after iteration m: h converges to the
       |  -- continued-fraction factor of I_cx(ca, cb)
       |  SELECT $K, ca, cb, cx, CAST(1.0 AS DOUBLE) AS c,
       |         1.0/(CASE WHEN abs(1.0 - (ca+cb)*cx/(ca+1.0)) < 1e-30
       |              THEN 1e-30 ELSE 1.0 - (ca+cb)*cx/(ca+1.0) END) AS d,
       |         1.0/(CASE WHEN abs(1.0 - (ca+cb)*cx/(ca+1.0)) < 1e-30
       |              THEN 1e-30 ELSE 1.0 - (ca+cb)*cx/(ca+1.0) END) AS h,
       |         0 AS m, false AS done
       |  FROM tcdf_sw WHERE cx > 0 AND cx1m > 0
       |  UNION ALL
       |  -- one iteration = the even then the odd fraction coefficient;
       |  -- staged through nested selects so each half-step's d/c feed the
       |  -- next exactly as in the scalar loop
       |  SELECT $K, ca, cb, cx, c2 AS c, d2 AS d, h*dl1*(d2*c2) AS h, m,
       |         abs(d2*c2 - 1.0) < 1e-15 AS done
       |  FROM (
       |    SELECT $K, ca, cb, cx, h, m, dl1,
       |           1.0/(CASE WHEN abs(1.0 + aa2*d1) < 1e-30 THEN 1e-30
       |                ELSE 1.0 + aa2*d1 END) AS d2,
       |           CASE WHEN abs(1.0 + aa2/c1) < 1e-30 THEN 1e-30
       |                ELSE 1.0 + aa2/c1 END AS c2
       |    FROM (
       |      SELECT $K, ca, cb, cx, h, m, d1, c1, d1*c1 AS dl1,
       |             -(ca+m)*(ca+cb+m)*cx/((ca+2.0*m)*(ca+1.0+2.0*m)) AS aa2
       |      FROM (
       |        SELECT $K, ca, cb, cx, h, m,
       |               1.0/(CASE WHEN abs(1.0 + aa1*d) < 1e-30 THEN 1e-30
       |                    ELSE 1.0 + aa1*d END) AS d1,
       |               CASE WHEN abs(1.0 + aa1/c) < 1e-30 THEN 1e-30
       |                    ELSE 1.0 + aa1/c END AS c1
       |        FROM (
       |          SELECT $K, ca, cb, cx, c, d, h, m+1 AS m,
       |                 (m+1)*(cb-(m+1))*cx
       |                   /((ca-1.0+2.0*(m+1))*(ca+2.0*(m+1))) AS aa1
       |          FROM tcdf_cf WHERE NOT done AND m < $maxIter
       |        ) s1
       |      ) s2
       |    ) s3
       |  ) s4),
       |tcdf_res AS (SELECT $K, arg_max(h, m) AS h FROM tcdf_cf GROUP BY $K),
       |tcdf_p AS (
       |  SELECT s.*, r.h,
       |    CASE WHEN s.cx <= 0 THEN
       |           (CASE WHEN s.swapped THEN CAST(1.0 AS DOUBLE)
       |                 ELSE CAST(0.0 AS DOUBLE) END)
       |         WHEN s.cx1m <= 0 THEN
       |           (CASE WHEN s.swapped THEN CAST(0.0 AS DOUBLE)
       |                 ELSE CAST(1.0 AS DOUBLE) END)
       |         WHEN s.swapped THEN
       |           1.0 - exp(lgamma(s.ca+s.cb)-lgamma(s.ca)-lgamma(s.cb)
       |                 + s.ca*ln(s.cx) + s.cb*ln(s.cx1m)) * r.h / s.ca
       |         ELSE exp(lgamma(s.ca+s.cb)-lgamma(s.ca)-lgamma(s.cb)
       |                 + s.ca*ln(s.cx) + s.cb*ln(s.cx1m)) * r.h / s.ca
       |    END AS p_cf
       |  FROM tcdf_sw s LEFT JOIN tcdf_res r USING ($K))""".stripMargin
  }
}
