package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{QueryModule, Tables}

/** SQL-1..5 — the raw-SQL entry surface (SURVEY.md §2.17).
  *
  * The reference exposes its data only through CLI subcommands
  * (`/root/reference/src/azanium/cli.py`); an engine a user could *switch
  * to* also needs the declarative front door: register the lake tables as
  * views and accept ANSI SQL. These queries run through `spark.sql(...)`
  * verbatim — the SAME text is the DuckDB oracle, which is the point: the
  * dialect subset used here (decimal-cast aggregation per [[graft.Det]],
  * TIMESTAMP literals, EXISTS, correlated scalar subqueries) is engine-
  * portable, so correctness of the whole SQL path (parser → analyzer →
  * Catalyst → Tungsten) is checked end-to-end, not just one operator.
  *
  * Scale posture: these are the classic TPC-H access patterns —
  *  - sql1: scan-bound partial+final hash agg (the canonical map-side
  *    combine; shuffle carries 4 groups, not 600k rows);
  *  - sql2: selective dim filter (BUILDING ≈ 1/5 of customers) joined
  *    before the fact agg — Catalyst pushes both date predicates into the
  *    parquet scans, AQE broadcasts the filtered customer side;
  *  - sql3: EXISTS compiles to a left-semi join (no row multiplication);
  *  - sql4: the 6-table snowflake — region/nation broadcast, the
  *    customer⋈orders⋈lineitem⋈supplier chain shuffles on its keys once;
  *  - sql5: correlated scalar subquery decorrelated by Catalyst into a
  *    per-partkey aggregate re-joined to the fact — one extra shuffle,
  *    never a per-row re-scan.
  */
object SqlOps extends QueryModule {

  /** Register every lake table under its canonical name so raw SQL can see
    * them. Idempotent per session; cheap (views are lazy plans). */
  def registerViews(s: SparkSession, d: String): Unit = {
    Tables.region(s, d).createOrReplaceTempView("region")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    Tables.part(s, d).createOrReplaceTempView("part")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.documents(s, d).createOrReplaceTempView("documents")
    Tables.embeddings(s, d).createOrReplaceTempView("embeddings")
  }

  private def runSql(name: String)(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(oracle(name))
  }

  // TPC-H Q1 shape: pricing summary. Decimal-cast sums per Det so Spark's
  // partial/final order and DuckDB's sequential order give bit-equal
  // doubles; the avg divides the exact decimal sum by the exact count.
  private val Sql1 =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // TPC-H Q3 shape: shipping priority. revenue DESC is a safe sort key
  // because the decimal protocol makes both engines' doubles identical;
  // l_orderkey breaks ties. Date surfaces as a STRING (no timestamp
  // encoding ambiguity between writers).
  private val Sql2 =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      |  CAST(CAST(o_orderdate AS DATE) AS STRING) AS orderdate,
      |  o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // TPC-H Q4 shape: EXISTS → left-semi join (Catalyst RewritePredicateSubquery);
  // the lineitem side is filtered by the correlated ship-after-order
  // predicate inside the semi-join, so no order row ever duplicates.
  private val Sql3 =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // TPC-H Q5 shape: the 6-table snowflake with the local-supplier
  // constraint (c_nationkey = s_nationkey).
  private val Sql4 =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // TPC-H Q17 shape: correlated scalar subquery. The 0.2*avg threshold is
  // IEEE-deterministic on both engines (integer-valued quantities sum
  // exactly; both perform the same double divide and multiply), so the
  // `<` compare cannot flip between them.
  private val Sql5 =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS below_avg_price,
      |  COUNT(*) AS n_small
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  // TPC-H Q18 shape: large-volume customers — aggregate IN-subquery with
  // HAVING. Catalyst rewrites the IN into a left-semi join against the
  // pre-aggregated subquery (one extra agg + semi join, no row
  // multiplication); the decimal threshold compare is exact on both
  // engines so the qualifying-order set cannot differ.
  private val Sql6 =
    """SELECT c_custkey, o_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) AS STRING) AS orderdate,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >
      |         CAST(200 AS DECIMAL(18,2)))
      |GROUP BY c_custkey, o_orderkey, o_orderdate
      |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin

  // TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
  // multi-supplier order (late := shipped after the cutoff; this lineitem
  // carries no receipt/commit dates). The EXISTS + NOT EXISTS pair
  // compiles to a left-semi AND a left-anti join against the same
  // self-correlated table — the hardest decorrelation pattern in the
  // TPC-H suite, checked verbatim against DuckDB.
  private val Sql7 =
    """SELECT s_suppkey, COUNT(*) AS n_waiting
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate >
      |                        TIMESTAMP '1998-06-01 00:00:00')
      |GROUP BY s_suppkey ORDER BY n_waiting DESC, s_suppkey
      |LIMIT 20""".stripMargin

  // TPC-H Q8 shape: national market share — the 8-table star (part,
  // lineitem, supplier, orders, customer, nation×2 — the same dim joined
  // under two roles — region). The share is a double divide of two
  // exact-decimal sums, so it cannot drift between engines. Catalyst
  // broadcasts every dimension (part after its selective filters, both
  // nation roles, region); only the lineitem⋈orders join shuffles.
  // o_year is CAST to BIGINT on both sides — Spark's EXTRACT returns INT,
  // DuckDB's BIGINT, and the driver compares schemas.
  private val Sql8 =
    """SELECT o_year,
      |  CAST(SUM(CASE WHEN n2_name = 'NATION_3' THEN vol
      |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
      |  CAST(SUM(vol) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS vol,
      |    n2.n_name AS n2_name
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
      |) t
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  // TPC-H Q9 shape: product-line profit by supplier nation and year (no
  // partsupp table in this lake, so profit is the discounted revenue).
  // The LIKE on p_name prunes part before its broadcast; the grouped year
  // comes straight from the fact-side timestamp, no re-join needed.
  private val Sql9 =
    """SELECT n_name AS nation,
      |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS profit
      |FROM part
      |JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin

  // TPC-H Q10 shape: returned-item reporting — top-20 customers by lost
  // revenue in a two-quarter window. Date range pushes into the orders
  // scan, the returnflag filter into lineitem; revenue DESC is a safe
  // sort key under the decimal protocol, c_custkey breaks ties.
  private val Sql10 =
    """SELECT c_custkey, c_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      |  CAST(c_acctbal AS DOUBLE) AS acctbal, n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql1_pricing_summary"  -> runSql("sql1_pricing_summary") _,
    "sql2_shipping_priority" -> runSql("sql2_shipping_priority") _,
    "sql3_order_priority"   -> runSql("sql3_order_priority") _,
    "sql4_local_supplier"   -> runSql("sql4_local_supplier") _,
    "sql5_small_quantity"   -> runSql("sql5_small_quantity") _,
    "sql6_large_volume"     -> runSql("sql6_large_volume") _,
    "sql7_waiting_supplier" -> runSql("sql7_waiting_supplier") _,
    "sql8_market_share"     -> runSql("sql8_market_share") _,
    "sql9_nation_profit"    -> runSql("sql9_nation_profit") _,
    "sql10_returned_items"  -> runSql("sql10_returned_items") _
  )

  override def oracle: Map[String, String] = Map(
    "sql1_pricing_summary"  -> Sql1,
    "sql2_shipping_priority" -> Sql2,
    "sql3_order_priority"   -> Sql3,
    "sql4_local_supplier"   -> Sql4,
    "sql5_small_quantity"   -> Sql5,
    "sql6_large_volume"     -> Sql6,
    "sql7_waiting_supplier" -> Sql7,
    "sql8_market_share"     -> Sql8,
    "sql9_nation_profit"    -> Sql9,
    "sql10_returned_items"  -> Sql10
  )
}
