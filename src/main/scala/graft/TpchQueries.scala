package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The 17 TPC-H queries not already covered by the `sql_q3/5/6/10/18`
 * oracle rows — the breadth close for "match Spark SQL capability"
 * (SURVEY §2 gap analysis): the correlated-subquery family (EXISTS
 * q4/q21/q22, scalar subqueries q2/q11/q15/q17/q20), the
 * disjunctive-pushdown shape (q19), left-join distribution (q13),
 * and the wide multi-join aggregates (q1/q7/q8/q9/q12/q14/q16).
 *
 * Adapted to the driver's TPC-H-ish schema, preserving each query's
 * RELATIONAL SHAPE rather than its literal text: there is no
 * partsupp table (lineitem grouped by (suppkey, partkey) plays the
 * part-supplier relation in q2/q11/q16/q20), no
 * l_commitdate/l_receiptdate ("late" is l_shipdate > o_orderdate +
 * INTERVAL, keeping the correlated non-equi predicate in q4/q12/q21),
 * no c_phone (c_nationkey is the q22 country code), and no o_comment
 * (an o_orderpriority anti-predicate keeps q13's filtered left join).
 *
 * One SQL text per query, executed VERBATIM by both Spark and the
 * DuckDB oracle. Cross-engine determinism rules:
 *  - money sums go through CAST(... AS DECIMAL(18,2)) so the
 *    aggregation is exact and order-independent (the established
 *    sql_q3 pattern);
 *  - averages/ratios are written as CAST(exact_decimal_sum AS
 *    DOUBLE) / count — a correctly-rounded conversion followed by
 *    one IEEE division, bit-identical in both engines — never a
 *    native avg() over doubles (whose partial-aggregation order
 *    differs per engine);
 *  - q17/q20 thresholds ride on l_quantity being integral (exact
 *    double sums in any order);
 *  - comparisons that gate rows (q11 HAVING, q15 max, q22 cutoff)
 *    compare exact decimals or bit-identical doubles, so the row
 *    set cannot flip between engines.
 *
 * 100 TB plan notes (asserted for the riskiest two in PlanAuditSpec):
 * q9's 5-way join must broadcast part/supplier/nation and never
 * degenerate into a cartesian; q21's NOT EXISTS must compile to an
 * anti join on l_orderkey (hash/SMJ with the non-equi residual),
 * never a nested loop; q19's OR-of-conjunctions must still extract
 * the common p_partkey = l_partkey equi-join. Scalar subqueries
 * (q2/q11/q15/q17/q20) each become one tiny aggregate that Spark
 * evaluates once and broadcasts — no per-row re-execution.
 *
 * Reference: the ophidia-server ships its SQL surface to the
 * underlying analytics DB verbatim (src/oph_query_parser.c); the
 * equivalent capability bar for a Spark-native engine is the full
 * TPC-H shape family, hence these 17.
 */
object TpchQueries {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem")

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    sql.map { case (name, text) =>
      name -> ((s: SparkSession, dir: String) => {
        tables.foreach(t =>
          s.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t))
        s.sql(text)
      })
    }

  /** Shared Spark/DuckDB text — also the oracle SQL, verbatim. */
  val sql: Map[String, String] = Map(

    // Q1: pricing summary — one scan, 4 decimal sums + 3 exact
    // averages + count, grouped by the 2 flag columns. At 100 TB this
    // is a pure map-side partial aggregate (6 groups).
    "sql_q1" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS sum_qty,
                CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS sum_base_price,
                CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2)
                  AS DOUBLE) AS sum_disc_price,
                CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2)
                  AS DOUBLE) AS sum_charge,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                  AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                  AS DOUBLE) / count(*) AS DOUBLE) AS avg_price,
                CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,2)))
                  AS DOUBLE) / count(*) AS DOUBLE) AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         GROUP BY l_returnflag, l_linestatus""",

    // Q2: min-cost supplier per part in a region — the correlated
    // scalar-subquery shape. Unit cost derives from lineitem
    // (extendedprice/quantity: one IEEE division, identical in both
    // engines). Spark evaluates the subquery as one grouped aggregate
    // joined back on p_partkey — never per-row.
    "sql_q2" ->
      """SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
                p.p_name
         FROM part p, supplier s, lineitem l, nation n, region r
         WHERE p.p_partkey = l.l_partkey
           AND s.s_suppkey = l.l_suppkey
           AND s.s_nationkey = n.n_nationkey
           AND n.n_regionkey = r.r_regionkey
           AND r.r_name = 'EUROPE'
           AND p.p_size = 15
           AND l.l_extendedprice / l.l_quantity = (
                 SELECT min(l2.l_extendedprice / l2.l_quantity)
                 FROM lineitem l2, supplier s2, nation n2, region r2
                 WHERE l2.l_partkey = p.p_partkey
                   AND s2.s_suppkey = l2.l_suppkey
                   AND s2.s_nationkey = n2.n_nationkey
                   AND n2.n_regionkey = r2.r_regionkey
                   AND r2.r_name = 'EUROPE')
         ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
         LIMIT 100""",

    // Q4: order-priority checking — correlated EXISTS with a
    // non-equi residual (late shipment vs the OUTER order's date).
    // Compiles to a left-semi join on l_orderkey.
    "sql_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders o
         WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
           AND o.o_orderdate < TIMESTAMP '1996-10-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_shipdate > o.o_orderdate
                           + INTERVAL 60 DAY)
         GROUP BY o_orderpriority""",

    // Q7: volume shipping between two nations — double nation join
    // (n1 supplier-side, n2 customer-side) with the symmetric pair
    // disjunction, grouped by year.
    "sql_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
                CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
         FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                      CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT)
                        AS l_year,
                      CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                        AS volume
               FROM supplier s, lineitem l, orders o, customer c,
                    nation n1, nation n2
               WHERE s.s_suppkey = l.l_suppkey
                 AND o.o_orderkey = l.l_orderkey
                 AND c.c_custkey = o.o_custkey
                 AND s.s_nationkey = n1.n_nationkey
                 AND c.c_nationkey = n2.n_nationkey
                 AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                 AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                   AND TIMESTAMP '1997-12-31') shipping
         GROUP BY supp_nation, cust_nation, l_year""",

    // Q8: national market share — a conditional-sum ratio. Both sums
    // are exact decimals; the share is one cast + one IEEE division,
    // bit-identical across engines without any rounding fudge.
    "sql_q8" ->
      """SELECT o_year,
                CAST(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                  / CAST(sum(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
         FROM (SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
                        AS o_year,
                      CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                        AS volume,
                      n2.n_name AS nation
               FROM part p, supplier s, lineitem l, orders o,
                    customer c, nation n1, nation n2, region r
               WHERE p.p_partkey = l.l_partkey
                 AND s.s_suppkey = l.l_suppkey
                 AND l.l_orderkey = o.o_orderkey
                 AND o.o_custkey = c.c_custkey
                 AND c.c_nationkey = n1.n_nationkey
                 AND n1.n_regionkey = r.r_regionkey
                 AND r.r_name = 'AMERICA'
                 AND s.s_nationkey = n2.n_nationkey
                 AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                   AND TIMESTAMP '1997-12-31'
                 AND p.p_type = 'ECONOMY') all_nations
         GROUP BY o_year""",

    // Q9: product-type profit — the 5-way join (part, supplier,
    // lineitem, orders, nation; partsupp's supplycost is
    // p_retailprice × quantity here). Plan-audited: part/supplier/
    // nation broadcast, lineitem⋈orders shuffles once, no cartesian.
    "sql_q9" ->
      """SELECT nation, o_year,
                CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
         FROM (SELECT n.n_name AS nation,
                      CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
                        AS o_year,
                      CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                        - CAST(p.p_retailprice AS DECIMAL(18,2))
                        * CAST(l.l_quantity AS DECIMAL(18,2)) AS amount
               FROM part p, supplier s, lineitem l, orders o, nation n
               WHERE s.s_suppkey = l.l_suppkey
                 AND p.p_partkey = l.l_partkey
                 AND o.o_orderkey = l.l_orderkey
                 AND s.s_nationkey = n.n_nationkey
                 AND p.p_name LIKE 'red%') profit
         GROUP BY nation, o_year""",

    // Q11: important stock — grouped decimal sums gated by an
    // UNCORRELATED scalar subquery (0.1% of the national total). Both
    // sides stay exact decimal, so the HAVING cut is engine-stable.
    "sql_q11" ->
      """SELECT l.l_partkey AS ps_partkey,
                CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE)
                  AS ps_value
         FROM lineitem l, supplier s, nation n
         WHERE l.l_suppkey = s.s_suppkey
           AND s.s_nationkey = n.n_nationkey
           AND n.n_name = 'NATION_5'
         GROUP BY l.l_partkey
         HAVING sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(l.l_quantity AS DECIMAL(18,2)))
           > (SELECT sum(CAST(l2.l_extendedprice AS DECIMAL(18,2))
                * CAST(l2.l_quantity AS DECIMAL(18,2))) * 0.001
              FROM lineitem l2, supplier s2, nation n2
              WHERE l2.l_suppkey = s2.s_suppkey
                AND s2.s_nationkey = n2.n_nationkey
                AND n2.n_name = 'NATION_5')""",

    // Q12: shipping priority split — conditional counts over a join
    // with a non-equi "late" predicate (linestatus plays shipmode).
    "sql_q12" ->
      """SELECT l.l_linestatus AS l_shipmode,
                CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                                OR o.o_orderpriority = '2-HIGH'
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS high_line_count,
                CAST(sum(CASE WHEN o.o_orderpriority <> '1-URGENT'
                               AND o.o_orderpriority <> '2-HIGH'
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS low_line_count
         FROM orders o, lineitem l
         WHERE o.o_orderkey = l.l_orderkey
           AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
           AND l.l_shipdate >= TIMESTAMP '1996-01-01'
           AND l.l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l.l_linestatus""",

    // Q13: customer order-count distribution — filtered LEFT join
    // (the anti-predicate lives in the join condition, not WHERE, so
    // order-less customers keep c_count = 0), then a second groupBy.
    "sql_q13" ->
      """SELECT c_count, count(*) AS custdist
         FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
               FROM customer c LEFT JOIN orders o
                 ON c.c_custkey = o.o_custkey
                    AND o.o_orderpriority <> '4-NOT SPECIFIED'
               GROUP BY c.c_custkey) c_orders
         GROUP BY c_count""",

    // Q14: promo revenue percentage — conditional decimal sums, one
    // IEEE multiply + divide.
    "sql_q14" ->
      """SELECT CAST(CAST(100 AS DOUBLE)
                  * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                      THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                  / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                      AS DOUBLE) AS DOUBLE) AS promo_revenue
         FROM lineitem l, part p
         WHERE l.l_partkey = p.p_partkey
           AND l.l_shipdate >= TIMESTAMP '1996-09-01'
           AND l.l_shipdate < TIMESTAMP '1996-10-01'""",

    // Q15: top supplier — CTE revenue view + scalar max subquery;
    // the equality is on exact decimals so the argmax set is stable.
    "sql_q15" ->
      """WITH revenue AS (
           SELECT l_suppkey AS supplier_no,
                  sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s.s_suppkey, s.s_name,
                CAST(r.total_rev AS DOUBLE) AS total_revenue
         FROM supplier s, revenue r
         WHERE s.s_suppkey = r.supplier_no
           AND r.total_rev = (SELECT max(total_rev) FROM revenue)""",

    // Q16: supplier-count distribution — count(DISTINCT) behind a
    // NOT IN subquery exclusion (null-free key, so NOT IN is a plain
    // anti join).
    "sql_q16" ->
      """SELECT p.p_brand, p.p_type, p.p_size,
                CAST(count(DISTINCT l.l_suppkey) AS BIGINT)
                  AS supplier_cnt
         FROM lineitem l, part p
         WHERE p.p_partkey = l.l_partkey
           AND p.p_brand <> 'Brand#1'
           AND p.p_type <> 'MEDIUM'
           AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
           AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                   WHERE s_acctbal < 0)
         GROUP BY p.p_brand, p.p_type, p.p_size""",

    // Q17: small-quantity revenue — correlated scalar subquery per
    // part. The threshold is sum/(5·count) over INTEGRAL quantities:
    // exact in both engines, so the row cut cannot flip.
    "sql_q17" ->
      """SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                  AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
         FROM lineitem l, part p
         WHERE p.p_partkey = l.l_partkey
           AND p.p_brand = 'Brand#3'
           AND p.p_type = 'SMALL'
           AND l.l_quantity < (SELECT sum(l2.l_quantity)
                                 / (5.0 * count(*))
                               FROM lineitem l2
                               WHERE l2.l_partkey = p.p_partkey)""",

    // Q19: disjunctive predicate pushdown — three OR'd conjunctions
    // each repeating the equi-key; Catalyst must still extract the
    // common p_partkey = l_partkey join (plan-audited: no cartesian).
    "sql_q19" ->
      """SELECT CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
                  AS DOUBLE) AS revenue
         FROM lineitem l, part p
         WHERE (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#12'
                AND p.p_size BETWEEN 1 AND 5
                AND l.l_quantity BETWEEN 1 AND 11)
            OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
                AND p.p_size BETWEEN 1 AND 10
                AND l.l_quantity BETWEEN 10 AND 20)
            OR (p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#5'
                AND p.p_size BETWEEN 1 AND 15
                AND l.l_quantity BETWEEN 20 AND 30)""",

    // Q20: excess-stock suppliers — nested IN subqueries with a
    // correlated scalar threshold (all-time shipped quantity vs half
    // of one year's part total; exact integer sums both sides).
    "sql_q20" ->
      """SELECT s.s_name, s.s_acctbal
         FROM supplier s, nation n
         WHERE s.s_nationkey = n.n_nationkey
           AND n.n_name = 'NATION_7'
           AND s.s_suppkey IN (
             SELECT ps.l_suppkey
             FROM (SELECT l.l_suppkey, l.l_partkey,
                          sum(l.l_quantity) AS availqty
                   FROM lineitem l
                   WHERE l.l_partkey IN (SELECT p_partkey FROM part
                                         WHERE p_name LIKE 'blue%')
                   GROUP BY l.l_suppkey, l.l_partkey) ps
             WHERE ps.availqty > (SELECT 0.5 * sum(l2.l_quantity)
                                  FROM lineitem l2
                                  WHERE l2.l_partkey = ps.l_partkey
                                    AND l2.l_shipdate >=
                                      TIMESTAMP '1996-01-01'
                                    AND l2.l_shipdate <
                                      TIMESTAMP '1997-01-01'))""",

    // Q21: suppliers who kept orders waiting — EXISTS (another
    // supplier on the order) + NOT EXISTS (no OTHER supplier was
    // late). Plan-audited: the NOT EXISTS is an anti join on
    // l_orderkey with the non-equi residual, never a nested loop.
    // The supplier×nation filter sits in a derived table ON PURPOSE:
    // with CBO off (the default) Catalyst keeps the FROM order, and
    // the flat 4-relation form ran the semi/anti pipeline over ALL
    // suppliers' lineitems before the nation cut — measured 309 s vs
    // 80 s at the 60M-row replica (3.9×). The derived table drops l1
    // to 1/|nations| of the corpus before the heavy joins, which is
    // exactly what a stats-fed CBO would choose.
    "sql_q21" ->
      """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
         FROM (SELECT s_suppkey, s_name FROM supplier, nation
               WHERE s_nationkey = n_nationkey
                 AND n_name = 'NATION_4') s,
              lineitem l1, orders o
         WHERE s.s_suppkey = l1.l_suppkey
           AND o.o_orderkey = l1.l_orderkey
           AND o.o_orderstatus = 'F'
           AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_shipdate > o.o_orderdate
                               + INTERVAL 60 DAY)
         GROUP BY s.s_name
         ORDER BY numwait DESC, s.s_name
         LIMIT 100""",

    // Q22: global sales opportunity — uncorrelated scalar average
    // (exact decimal sum / count, IEEE division) + NOT EXISTS anti
    // join (customers with no RECENT orders; every synthetic customer
    // has some order, so the date predicate keeps the cut non-empty).
    "sql_q22" ->
      """SELECT cntrycode, count(*) AS numcust,
                CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2)
                  AS DOUBLE) AS totacctbal
         FROM (SELECT CAST(c.c_nationkey AS BIGINT) AS cntrycode,
                      c.c_acctbal
               FROM customer c
               WHERE c.c_nationkey IN (1, 4, 7, 10, 13, 17, 20)
                 AND c.c_acctbal > (
                       SELECT CAST(sum(CAST(c2.c_acctbal
                           AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                       FROM customer c2
                       WHERE c2.c_acctbal > 0.0
                         AND c2.c_nationkey IN (1, 4, 7, 10, 13, 17, 20))
                 AND NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderdate >=
                                     TIMESTAMP '1999-01-01')) custsale
         GROUP BY cntrycode"""
  )
}
