package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator pack over the TPC-H-ish testdata tables.
  *
  * Determinism contract with the DuckDB oracle (driver hash-compares values
  * after sorting): all money arithmetic happens in the DECIMAL domain. The
  * input doubles are exact 2-decimal values (verified against testdata), so
  * `cast(x as decimal)` is exact in both engines, decimal add/multiply are
  * exact, and
  * decimal SUM is order-independent — hashes match bit-for-bit. Casting
  * double *products* to decimal would NOT match: Spark rounds the double's
  * shortest string representation while DuckDB rounds the binary value.
  * Aggregate outputs get a final lossless cast to a pinned DECIMAL(38,s) so
  * both engines emit the same scale.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** money column (exact 2-decimal double) → decimal */
  private def m(c: Column): Column = c.cast("decimal(18,2)")
  /** percentage-like column (discount/tax, 2-decimal in [0,1]) */
  private def onem(c: Column): Column = (lit(1) - c.cast("decimal(4,2)")).cast("decimal(4,2)")
  private def onep(c: Column): Column = (lit(1) + c.cast("decimal(4,2)")).cast("decimal(4,2)")
  /** Final output cast for decimal aggregates: pin the scale, then emit
    * DOUBLE. The *arithmetic* stays in the exact decimal domain; only the
    * output representation converts. Rationale (driver comparator): the
    * driver converts the DuckDB oracle via pandas `.df()`, which turns
    * DECIMAL into float64, while Spark's parquet decimal survives as
    * Decimal objects — same value, different hash. Converting BOTH sides
    * decimal→double yields identical float64 bits — PROVIDED both engines
    * round the conversion correctly. Spark (BigDecimal.doubleValue) does;
    * DuckDB's direct DECIMAL(38,s)→DOUBLE cast is 1 ulp off once the
    * unscaled value outgrows 2^53 (first seen at the 10× corpus:
    * q1's sum_charge, exact decimal …809902, direct cast …809906 vs the
    * correctly-rounded …8099 — r13). The oracles therefore route the
    * final cast through VARCHAR (`::VARCHAR::DOUBLE`), whose string→double
    * parse is correctly rounded, keeping the two engines bit-identical at
    * every corpus size. */
  private def fin(c: Column, s: Int): Column =
    c.cast(s"decimal(38,$s)").cast("double")

  val defs: Map[String, Q] = Map(
    // TPC-H Q1 shape: full-table scan + hash aggregate. Partial (map-side)
    // aggregation shuffles only |groups| rows per partition.
    "q1_pricing_summary" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          fin(sum(m(col("l_quantity"))), 2).as("sum_qty"),
          fin(sum(m(col("l_extendedprice"))), 2).as("sum_base_price"),
          fin(sum(m(col("l_extendedprice")) * onem(col("l_discount"))), 4).as("sum_disc_price"),
          fin(sum(m(col("l_extendedprice")) * onem(col("l_discount")) * onep(col("l_tax"))), 6).as("sum_charge"),
          count(lit(1)).as("count_order"))
    },

    // TPC-H Q3 shape: 3-way join. The customer side is deliberately
    // UNhinted: customer SCALES with the dataset (unlike nation/region),
    // so a pinned broadcast is the driver-OOM class at 100 TB — the
    // planner broadcasts it from accurate scan stats at gate scale and
    // flips to SMJ past the threshold, the transition a real cluster
    // must make.
    "q3_shipping_priority" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables(s, dir, "orders").filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
      val l = Tables(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        // date → midnight timestamp: pyarrow date32 arrives in pandas as
        // datetime.date objects while DuckDB DATE arrives as datetime64 —
        // same value, different hash. Timestamps convert identically.
        .groupBy(col("o_orderkey"),
          col("o_orderdate").cast("date").cast("timestamp").as("orderdate"))
        .agg(fin(sum(m(col("l_extendedprice")) * onem(col("l_discount"))), 4).as("revenue"))
    },

    // Semi-join (EXISTS) + aggregate.
    "q4_order_priority" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem").filter(col("l_discount") > 0.05)
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
    },

    // TPC-H Q5 shape: 6-way join. nation/region are FIXED-size dims
    // (25/5 rows) → pinned broadcasts; customer and supplier SCALE with
    // the dataset and stay unhinted — broadcast at gate scale by scan
    // stats, SMJ past the threshold (a pinned non-flip is the defect).
    "q5_local_supplier" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem")
      val su = Tables(s, dir, "supplier")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(fin(sum(m(col("l_extendedprice")) * onem(col("l_discount"))), 4).as("revenue"))
    },

    // TPC-H Q6 shape: pure scan+filter+agg; filters push to parquet.
    "q6_revenue_forecast" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
                col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(fin(sum(m(col("l_extendedprice")) * col("l_discount").cast("decimal(4,2)")), 4).as("revenue"),
             count(lit(1)).as("n_rows"))
    },

    // TPC-H Q10 shape: top-20 by decimal revenue with key tiebreak (total
    // order → deterministic LIMIT in both engines).
    "q10_returned_items" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      val l = Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(fin(sum(m(col("l_extendedprice")) * onem(col("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    },

    "q_topk_orders" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          m(col("o_totalprice")).cast("double").as("totalprice"))
        .orderBy(col("totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },

    // Running total per customer — one shuffle on o_custkey, then sorted
    // window within partitions.
    "q_window_running_total" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          fin(sum(m(col("o_totalprice"))).over(w), 2).as("running_total"))
    },

    "q_window_top3_per_customer" -> { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          m(col("o_totalprice")).cast("double").as("totalprice"), col("rk"))
    },

    // Anti-join (NOT EXISTS) — against the urgent-order subset: every
    // customer in the testdata has SOME order at sf≥0.01, so the plain
    // anti-join would pass vacuously on an empty result.
    "q_customers_without_orders" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // Semi-join projection.
    "q_parts_ordered" -> { (s, dir) =>
      val p = Tables(s, dir, "part")
      val l = Tables(s, dir, "lineitem")
      p.join(l, col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_brand")
    },

    // ROLLUP grouping sets (null-filled super-aggregate rows).
    "q_rollup_regional_sales" -> { (s, dir) =>
      // Expressed in SQL: the DataFrame rollup API false-positives Spark's
      // ambiguous-self-join check on Expand-duplicated grouping attrs in
      // this join shape. Plan is identical (ROLLUP → Expand + Aggregate).
      Seq("orders", "customer", "nation", "region")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(s"rr_$t"))
      s.sql(
        """SELECT r_name, n_name,
          | CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_sales,
          | count(*) AS n_orders
          |FROM rr_orders JOIN rr_customer ON o_custkey = c_custkey
          | JOIN rr_nation ON c_nationkey = n_nationkey
          | JOIN rr_region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)""".stripMargin)
    },

    // CUBE — the full grouping-sets lattice next to q_rollup's
    // hierarchy: all four (brand, container) subtotal combinations in
    // ONE pass (Expand + a single aggregate — Catalyst never rescans
    // the table per grouping set). GROUPING() disambiguates a real
    // NULL from a subtotal row, published as exact ints; money stays
    // DECIMAL until the final double cast.
    "q_cube_part_stats" -> { (s, dir) =>
      Tables(s, dir, "part")
        .cube(col("p_brand"), col("p_size"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("p_retailprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)").cast("double").as("total_retail"),
          grouping(col("p_brand")).as("g_brand"),
          grouping(col("p_size")).as("g_container"))
    },

    // Conditional aggregation (pivot-shaped without PIVOT).
    "q_status_mix" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"),
          fin(sum(when(col("o_orderstatus") === "F", m(col("o_totalprice"))).otherwise(lit(null))), 2).as("sales_f"))
    },

    "q_segment_stats" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
             count(lit(1)).as("n_orders"),
             fin(sum(m(col("o_totalprice"))), 2).as("total_sales"))
    },

    "q_part_type_share" -> { (s, dir) =>
      Tables(s, dir, "part")
        .groupBy("p_type")
        .agg(count(lit(1)).as("n_parts"),
             fin(sum(m(col("p_retailprice"))), 2).as("total_retail"),
             min(col("p_size")).as("min_size"),
             max(col("p_size")).as("max_size"))
    },

    // Set op: UNION (distinct) of two key spaces.
    "q_union_nation_keys" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(su).distinct().select(col("nationkey").cast("int").as("nationkey"))
    },

    // Correlated-scalar shape: customers whose account balance exceeds
    // their nation's average. The per-nation totals are a 25-row
    // groupBy broadcast back to the scan — NOT a window: partitionBy
    // over a 25-value key caps parallelism at 25 tasks and shuffles the
    // whole customer table into them (the skew class salting exists
    // for), where the aggregate partial-aggs to 25 rows map-side and
    // the filter stays scan-shaped. The avg comparison is expressed as
    // bal*n > sum(bal) in exact decimal arithmetic so both engines agree
    // bit-for-bit (DuckDB's AVG returns double, which could flip boundaries).
    "q_above_nation_avg" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val stats = c.groupBy("c_nationkey")
        .agg(sum(m(col("c_acctbal"))).as("nation_sum"),
          count(lit(1)).as("nation_n"))
      c.join(broadcast(stats), "c_nationkey")
        .filter(m(col("c_acctbal")) * col("nation_n") > col("nation_sum"))
        .select("c_custkey", "c_nationkey")
    },

    // TPC-H Q2 shape: min-per-group with arg-min tie-break (decorrelated
    // form of the MIN subquery). One lexicographic min(struct(price,
    // suppkey)) IS "the min price, and the smallest suppkey among its
    // rows" — a single partial-aggregable groupBy where the window-min +
    // equality-filter + re-aggregate form shuffled and sorted EVERY
    // lineitem row to run the same reduction (the TopKPerKey argument
    // at k=1, expressible as a plain aggregate).
    "q2_min_cost_supplier" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          m(col("l_extendedprice")).as("price"))
        .groupBy("l_partkey")
        .agg(min(struct(col("price"), col("l_suppkey"))).as("w"))
        .select(col("l_partkey"),
          col("w.l_suppkey").as("cheapest_suppkey"),
          fin(col("w.price"), 2).as("min_price"))
    },

    // TPC-H Q7 shape: bidirectional two-nation trade volume by ship
    // year — the double nation-dimension join (supplier nation ×
    // customer nation), disjunctive nation-pair predicate. Nations
    // broadcast (25 rows); the fact-side joins stay unhinted.
    "q7_volume_shipping" -> { (s, dir) =>
      val n1 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(fin(sum(m(col("l_extendedprice")) * onem(col("l_discount"))), 4).as("revenue"))
    },

    // TPC-H Q8 shape: national market share — a region's PROMO-part
    // order revenue by year, with one supplier nation's share. The
    // share is a ratio of two exact decimal sums, each cast to double
    // before ONE IEEE division (cross-engine identical); a conditional
    // sum of an empty set yields 0 via coalesce.
    "q8_market_share" -> { (s, dir) =>
      val nc = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
      val ns = Tables(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val r = Tables(s, dir, "region").filter(col("r_name") === "EUROPE")
      val p = Tables(s, dir, "part").filter(col("p_type") === "PROMO")
      Tables(s, dir, "lineitem")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nc), col("c_nationkey") === col("c_nk"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(ns), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(m(col("l_extendedprice")) * onem(col("l_discount"))).as("vol"),
          sum(when(col("supp_nation") === "NATION_3",
            m(col("l_extendedprice")) * onem(col("l_discount")))).as("nvol"))
        .select(col("o_year"),
          (coalesce(col("nvol"), lit(0)).cast("decimal(38,4)").cast("double") /
            col("vol").cast("decimal(38,4)").cast("double")).as("mkt_share"))
    },

    // TPC-H Q9 shape: product-type profit — LIKE-filtered part dim, the
    // widest star (part⋈supplier⋈nation⋈orders on lineitem), profit =
    // revenue − cost in exact decimals per (nation, order-year). These
    // tables carry no partsupp, so p_retailprice·quantity stands in for
    // the supplycost term — same join/aggregate structure. The LIKE
    // predicate reaches the part scan as a StringContains pushdown.
    "q9_product_profit" -> { (s, dir) =>
      val p = Tables(s, dir, "part").filter(col("p_name").contains("red"))
      Tables(s, dir, "lineitem")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(Tables(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(fin(sum(m(col("l_extendedprice")) * onem(col("l_discount")) -
          m(col("p_retailprice")) * m(col("l_quantity"))), 4).as("sum_profit"))
    },

    // TPC-H Q11 shape: important-stock identification — per-part value
    // vs a global-sum threshold. The threshold rides a broadcast 1-row
    // aggregate cross-join (one lazy plan, no driver collect), and the
    // comparison multiplies by the part count instead of dividing the
    // total (value·n_parts > total ⇔ above-average value, selective at
    // every scale): both sides convert the same exact decimals to
    // double, so the strict > agrees bit-for-bit cross-engine. Value
    // proxy: p_retailprice·quantity (no partsupp on these tables).
    // The value aggregate runs join-FREE: p_retailprice is constant per
    // part, so sum(price·qty) = price·sum(qty) — the quantity rollup
    // partial-aggs straight off the lineitem scan and the part dim
    // joins the |parts|-sized result, not every line (at 100 TB the
    // per-row broadcast probe on the fact scan disappears). The inner
    // sum is cast to DECIMAL(18,2) before the multiply so the product
    // stays inside decimal(38) exactly (per-part line counts are
    // SF-invariant in this schema; 10^16 of headroom), keeping the
    // factored value bit-equal to the oracle's sum-of-products.
    "q11_important_parts" -> { (s, dir) =>
      val pv = Tables(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(m(col("l_quantity"))).cast("decimal(18,2)").as("sum_qty"))
        .join(Tables(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          (m(col("p_retailprice")) * col("sum_qty")).as("value"))
      // count(l_partkey), not count(1): identical value (pv's key is an
      // inner-join key — never null) but the live column reference
      // stops Catalyst from pruning l_partkey out of this branch, so
      // the total subtree stays byte-identical to pv's and AQE reuses
      // ONE lineitem scan+partial-aggregate stage for both (the
      // q_doc_top_terms ReuseExchange pattern; count(1) re-ran the
      // whole lineitem aggregation a second time). l_partkey is
      // nullable-typed from parquet, so the count(col) survives the
      // count(non-nullable)→count(1) rewrite.
      val total = pv.agg(sum(col("value")).as("total_value"),
        count(col("l_partkey")).as("n_parts"))
      pv.crossJoin(broadcast(total))
        .filter(col("value").cast("double") * col("n_parts") >
          col("total_value").cast("double"))
        .select(col("l_partkey"), fin(col("value"), 4).as("part_value"))
    },

    // TPC-H Q12 shape: shipping-priority split — one fact join, two
    // conditional counts per group (the CASE-WHEN-in-aggregate idiom),
    // date-window filter pushed to the lineitem scan. l_linestatus
    // stands in for the shipmode column these tables don't carry.
    "q12_priority_lines" -> { (s, dir) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
    },

    // TPC-H Q20 shape: potential part promotion — nested aggregation
    // (per part-supplier vs per part) + semi-join back to the supplier
    // dim. A supplier qualifies by shipping >50% of a PROMO part's
    // windowed volume (qty·2 > total in doubles from exact decimals —
    // the q11 comparison trick); left_semi keeps supplier rows without
    // duplicating per qualifying part.
    "q20_heavy_suppliers" -> { (s, dir) =>
      val p = Tables(s, dir, "part").filter(col("p_type") === "PROMO")
      val l97 = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
      val perPs = l97.groupBy("l_partkey", "l_suppkey")
        .agg(sum(m(col("l_quantity"))).as("ps_qty"))
      val perP = l97.groupBy(col("l_partkey").as("pk"))
        .agg(sum(m(col("l_quantity"))).as("p_qty"))
      val heavy = perPs.join(perP, col("l_partkey") === col("pk"))
        .filter(col("ps_qty").cast("double") * 2 > col("p_qty").cast("double"))
        .select(col("l_suppkey"))
      Tables(s, dir, "supplier")
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    },

    // TPC-H Q21 shape: suppliers who kept orders waiting — the double
    // correlated EXISTS / NOT EXISTS. A supplier counts when its line
    // was flagged 'R' in a finished multi-supplier order and NO other
    // supplier of that order was flagged — the sole-fault semantics of
    // the original (return flag stands in for the receipt/commit
    // lateness columns). Both EXISTS collapse to per-order COUNTS over
    // the deduplicated (order, supplier, any-fault) pair table: a fault
    // pair qualifies iff its order has ≥2 suppliers and exactly 1 fault
    // supplier — the retention-cohort discipline (derive the predicate
    // from a window over the relation itself, not semi/anti self-joins
    // that re-shuffle the pair table twice more). After the
    // lineitem⋈orders SMJ at scale, HashPartitioning(orderkey)
    // satisfies BOTH the (ok, sk) pre-aggregation (subset rule) and the
    // per-order window — zero additional pair-table exchanges.
    "q21_waiting_suppliers" -> { (s, dir) =>
      val base = Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      // r16: the explicit repartition(l_orderkey) lets the (ok, sk)
      // aggregate AND the per-order window share ONE exchange —
      // HashPartitioning(ok) satisfies the aggregate's
      // ClusteredDistribution(ok, sk) by the subset rule and the
      // window's partitionBy(ok) outright (the dup_spans pattern).
      // Map-side partial aggregation loses ~nothing here: (ok, sk)
      // pairs are near-unique in lineitem, so the unhinted shape paid
      // a second full exchange for no reduction.
      val perPair = base
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .agg(max((col("l_returnflag") === "R").cast("int")).as("is_fault"))
      val w = Window.partitionBy("ok")
      perPair
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_fault_supp", sum(col("is_fault")).over(w))
        .filter(col("is_fault") === 1 && col("n_supp") >= 2 &&
          col("n_fault_supp") === 1)
        .groupBy("sk").agg(count(lit(1)).as("numwait"))
        .join(Tables(s, dir, "supplier"), col("sk") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
    },

    // TPC-H Q14 shape: promo revenue percentage — conditional aggregate
    // over one join, ratio emitted via double division of exact decimals.
    "q14_promo_revenue" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .join(Tables(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO",
            m(col("l_extendedprice")) * onem(col("l_discount")))).as("promo"),
          sum(m(col("l_extendedprice")) * onem(col("l_discount"))).as("total"))
        .select(
          (lit(100.0) * coalesce(col("promo"), lit(0)).cast("decimal(38,4)").cast("double") /
            col("total").cast("decimal(38,4)").cast("double")).as("promo_revenue_pct"))
    },

    // TPC-H Q17 shape: small-quantity-order revenue — a per-part average
    // threshold (correlated aggregate decorrelated into a join). The
    // threshold is one double division of an exact decimal sum by the
    // count, then one double multiply — identical in both engines.
    // The threshold aggregate runs AFTER a broadcast semi-join on the
    // brand's partkeys: the average is per-part, so restricting to the
    // surviving parts changes nothing, and the aggregate scans the
    // brand's slice of lineitem instead of all of it — at 100 TB the
    // difference between ~1/brand-count of the table and the table.
    "q17_small_quantity" -> { (s, dir) =>
      val l = Tables(s, dir, "lineitem")
      val p5 = Tables(s, dir, "part").filter(col("p_brand") === "Brand#5")
      val avgq = l
        .join(p5, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("ap_key"))
        .agg((sum(m(col("l_quantity"))).cast("decimal(38,2)").cast("double") /
          count(lit(1))).as("avg_qty"))
      l.join(p5, col("l_partkey") === col("p_partkey"))
        .join(avgq, col("l_partkey") === col("ap_key"))
        .filter(col("l_quantity") < lit(0.4) * col("avg_qty"))
        .agg((sum(m(col("l_extendedprice"))).cast("decimal(38,2)").cast("double") /
          lit(7.0)).as("avg_yearly"))
    },

    // TPC-H Q15 shape: top supplier by quarterly revenue — the
    // "equals the global max" semi-join. The max is a broadcast 1-row
    // aggregate cross-join (the q22 threshold pattern: one lazy plan,
    // no driver-side collect); decimal equality is exact cross-engine.
    "q15_top_supplier" -> { (s, dir) =>
      val rev = Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(sum(m(col("l_extendedprice")) * onem(col("l_discount"))).as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("max_rev"))
      Tables(s, dir, "supplier")
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"),
          fin(col("total_rev"), 4).as("total_revenue"))
    },

    // TPC-H Q16 shape: supplier diversity per part attribute group —
    // distinct (part, supplier) reduction BEFORE the dimension join, so
    // the count-distinct aggregates a pre-shrunk pair table (the
    // partsupp analog on these tables is lineitem's pair projection).
    "q16_supplier_diversity" -> { (s, dir) =>
      // no pre-join .distinct(): countDistinct's own first aggregate
      // dedups (p_brand, p_type, p_size, l_suppkey) with MAP-SIDE
      // partial aggregation, so an explicit distinct on (l_partkey,
      // l_suppkey) only added a full extra exchange of the pair set
      // before the broadcast join (r16 plan audit: 3 exchanges → 2;
      // the join side is a broadcast of filtered part, so nothing
      // downstream needed the pairs deduped early).
      val ps = Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
      Tables(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1")
        .join(ps, col("p_partkey") === col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    },

    // TPC-H Q13 shape: left outer join + two-level aggregation
    // (orders-per-customer distribution, keeping zero-order customers).
    "q13_order_distribution" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    },

    // TPC-H Q18 shape: HAVING on a big aggregate, then join back.
    // r17 (VERDICT r16 item 4, guide §3.1): broadcast the
    // HAVING-filtered side explicitly. Unhinted, the static planner
    // estimated the orders SCAN under the auto-broadcast threshold and
    // built the whole orders table (sf1t plan: BroadcastExchange over
    // orders, BuildLeft — 10× the bytes of the filtered aggregate),
    // while the side that is tiny BY CONSTRUCTION (orders with >300
    // total qty ≈ 0.03% of orders; ~24 B/row ⇒ ~700 MB even at the
    // 100 TB decade, well under the broadcast caps) streamed through an
    // exchange. The hint pins build/probe the right way at every scale:
    // orders is now neither shuffled nor broadcast.
    "q18_large_orders" -> { (s, dir) =>
      val l = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val big = l.groupBy("l_orderkey")
        .agg(fin(sum(m(col("l_quantity"))), 2).as("total_qty"))
        .filter(col("total_qty") > 300)
      o.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").cast("timestamp").as("orderdate"),
          col("total_qty"))
    },

    // TPC-H Q19 shape: disjunctive multi-attribute predicates (OR of ANDs)
    // — exercises predicate normalization/pushdown.
    "q19_disjunctive_revenue" -> { (s, dir) =>
      val l = Tables(s, dir, "lineitem")
      val p = Tables(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 20) && col("p_size").between(1, 10)) ||
          (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 30) && col("p_size").between(1, 20)) ||
          (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 40) && col("p_size").between(1, 30)))
        .agg(fin(sum(m(col("l_extendedprice")) * onem(col("l_discount"))), 4).as("revenue"),
             count(lit(1)).as("n_rows"))
    },

    // TPC-H Q22 shape: anti-join + set membership on a computed key with a
    // global-aggregate threshold (bal*N > totalsum in exact decimals).
    "q22_idle_customers" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      // global threshold as a broadcast 1-row aggregate cross-join: stays
      // a single lazy plan (no driver-side collect / extra job).
      val stats = c.filter(m(col("c_acctbal")) > 0).agg(
        sum(m(col("c_acctbal"))).as("bal_total"), count(lit(1)).as("bal_n"))
      // "idle" = at most five orders (≈ bottom decile of the ~10/customer
      // testdata distribution; zero-order customers don't exist at sf0.01,
      // so stricter thresholds verify nothing)
      val orderCounts = o.groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
      c.filter(col("c_nationkey") % 5 === 0)
        .crossJoin(broadcast(stats))
        .filter(m(col("c_acctbal")) * col("bal_n") > col("bal_total"))
        .join(orderCounts, col("c_custkey") === col("o_custkey"), "left_outer")
        .filter(coalesce(col("n_orders"), lit(0L)) <= 5)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), fin(sum(m(col("c_acctbal"))), 2).as("totacctbal"))
    },

    // Same semantics as q_window_top3_per_customer but via the bounded
    // top-k Aggregator (graft.operators.TopKPerKey): map-side k-bounded
    // buffers mean only k rows per key per partition shuffle, vs the
    // window form shuffling every row. Oracle = the window formulation —
    // proving the operators agree.
    "q_topk_agg_per_customer" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      graft.operators.TopKPerKey
        .topK(s, o, "o_custkey", "o_totalprice", "o_orderkey", 3)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").cast("double").as("totalprice"),
          col("rk"))
    },

    // Skew-mitigated join via the SaltedJoin operator: the large side's
    // key is salted (deterministic xxhash), the small side replicated per
    // salt, joined on (key, salt). Result set is IDENTICAL to the plain
    // join — the oracle is the unsalted formulation, proving it. For the
    // single-hot-key shapes AQE's skew split can't fix in SMJ.
    "q_salted_join_orders" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.operators.SaltedJoin.join(o, c, "o_custkey", salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             countDistinct(col("o_custkey")).as("n_customers"))
    },

    // As-of join (event-time alignment): for each purchase, the same
    // user's latest prior click. Implemented with the union+window trick —
    // one shuffle on user_id, no range join blowup — identical
    // formulation on the DuckDB side for exact parity (Spark has no
    // native ASOF join; this is the scalable composition).
    "q_events_asof_click" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("purchase_id"), lit(0).as("kind"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"), lit(1).as("kind"))
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("kind"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("last_click_ts",
          max(when(col("kind") === 0, col("ts"))).over(w))
        .filter(col("kind") === 1)
        .select(col("user_id"), col("purchase_id"), col("ts").as("purchase_ts"),
          col("last_click_ts"))
    }
  )

  private val revenueExpr =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))::VARCHAR::DOUBLE AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))::VARCHAR::DOUBLE AS sum_base_price,
        | CAST(sum($revenueExpr) AS DECIMAL(38,4))::VARCHAR::DOUBLE AS sum_disc_price,
        | CAST(sum($revenueExpr * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DECIMAL(38,6))::VARCHAR::DOUBLE AS sum_charge,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping_priority" ->
      s"""SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS orderdate,
        | CAST(sum($revenueExpr) AS DECIMAL(38,4))::VARCHAR::DOUBLE AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY o_orderkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
        |GROUP BY o_orderpriority""".stripMargin,
    "q5_local_supplier" ->
      s"""SELECT r_name, n_name,
        | CAST(sum($revenueExpr) AS DECIMAL(38,4))::VARCHAR::DOUBLE AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q6_revenue_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4))::VARCHAR::DOUBLE AS revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name,
        | CAST(sum($revenueExpr) AS DECIMAL(38,4))::VARCHAR::DOUBLE AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
        |FROM orders ORDER BY totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_window_running_total" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,2))::VARCHAR::DOUBLE AS running_total
        |FROM orders""".stripMargin,
    "q_window_top3_per_customer" ->
      """SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice, rk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        | FROM orders) WHERE rk <= 3""".stripMargin,
    "q_customers_without_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q_parts_ordered" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin,
    "q_rollup_regional_sales" ->
      """SELECT r_name, n_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))::VARCHAR::DOUBLE AS total_sales,
        | count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q_cube_part_stats" ->
      """SELECT p_brand, p_size, count(*) AS n_parts,
        | CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(38,2))::VARCHAR::DOUBLE AS total_retail,
        | CAST(grouping(p_brand) AS INT) AS g_brand,
        | CAST(grouping(p_size) AS INT) AS g_container
        |FROM part GROUP BY CUBE (p_brand, p_size)""".stripMargin,
    "q_status_mix" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DECIMAL(38,2))::VARCHAR::DOUBLE AS sales_f
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_segment_stats" ->
      """SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_customers,
        | count(*) AS n_orders, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))::VARCHAR::DOUBLE AS total_sales
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_part_type_share" ->
      """SELECT p_type, count(*) AS n_parts,
        | CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DECIMAL(38,2))::VARCHAR::DOUBLE AS total_retail,
        | min(p_size) AS min_size, max(p_size) AS max_size
        |FROM part GROUP BY p_type""".stripMargin,
    "q_union_nation_keys" ->
      """SELECT DISTINCT nationkey FROM (
        | SELECT c_nationkey AS nationkey FROM customer
        | UNION ALL SELECT s_nationkey AS nationkey FROM supplier)""".stripMargin,
    "q_above_nation_avg" ->
      """SELECT c_custkey, c_nationkey FROM (
        | SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
        |  sum(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY c_nationkey) AS nation_sum,
        |  count(*) OVER (PARTITION BY c_nationkey) AS nation_n
        | FROM customer) WHERE bal * nation_n > nation_sum""".stripMargin,
    "q2_min_cost_supplier" ->
      """SELECT l_partkey, min(l_suppkey) AS cheapest_suppkey,
        | CAST(min(price) AS DECIMAL(38,2))::VARCHAR::DOUBLE AS min_price
        |FROM (SELECT l_partkey, l_suppkey, CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
        |       min(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (PARTITION BY l_partkey) AS min_price
        |      FROM lineitem)
        |WHERE price = min_price GROUP BY l_partkey""".stripMargin,
    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | year(l_shipdate) AS l_year,
        | CAST(sum($revenueExpr) AS DECIMAL(38,4))::VARCHAR::DOUBLE AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""".stripMargin,
    "q8_market_share" ->
      s"""SELECT o_year,
        | CAST(coalesce(nvol, 0) AS DOUBLE) / CAST(vol AS DOUBLE) AS mkt_share
        |FROM (
        | SELECT year(o_orderdate) AS o_year,
        |  CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS vol,
        |  CAST(sum(CASE WHEN ns.n_name = 'NATION_3' THEN $revenueExpr END) AS DECIMAL(38,4)) AS nvol
        | FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region ON nc.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        | WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        | GROUP BY year(o_orderdate))""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
        | CAST(sum($revenueExpr -
        |   CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)))
        |  AS DECIMAL(38,4))::VARCHAR::DOUBLE AS sum_profit
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, year(o_orderdate)""".stripMargin,
    "q11_important_parts" ->
      """WITH pv AS (
        | SELECT l_partkey,
        |  sum(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS value
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | GROUP BY l_partkey)
        |SELECT l_partkey, CAST(value AS DECIMAL(38,4))::VARCHAR::DOUBLE AS part_value
        |FROM pv
        |WHERE CAST(value AS DOUBLE) * (SELECT count(*) FROM pv)
        |    > (SELECT CAST(sum(value) AS DOUBLE) FROM pv)""".stripMargin,
    "q12_priority_lines" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus""".stripMargin,
    "q20_heavy_suppliers" ->
      """WITH l97 AS (
        | SELECT l_partkey, l_suppkey, l_quantity
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_type = 'PROMO'
        |   AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'),
        |perps AS (
        | SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS ps_qty
        | FROM l97 GROUP BY l_partkey, l_suppkey),
        |perp AS (
        | SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(18,2))) AS p_qty
        | FROM l97 GROUP BY l_partkey)
        |SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (
        | SELECT l_suppkey FROM perps JOIN perp ON l_partkey = pk
        | WHERE CAST(ps_qty AS DOUBLE) * 2 > CAST(p_qty AS DOUBLE))""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH base AS (
        | SELECT l_orderkey, l_suppkey, l_returnflag
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderstatus = 'F'),
        |pairs AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM base),
        |faults AS (
        | SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        | FROM base WHERE l_returnflag = 'R'),
        |sole AS (
        | SELECT f.ok, f.sk FROM faults f
        | WHERE EXISTS (SELECT 1 FROM pairs p WHERE p.ok = f.ok AND p.sk <> f.sk)
        |   AND NOT EXISTS (SELECT 1 FROM faults f2 WHERE f2.ok = f.ok AND f2.sk <> f.sk))
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM sole JOIN supplier ON sk = s_suppkey
        |GROUP BY s_suppkey, s_name""".stripMargin,
    "q14_promo_revenue" ->
      s"""SELECT 100.0 * CAST(coalesce(promo, 0) AS DOUBLE) / CAST(total AS DOUBLE) AS promo_revenue_pct
        |FROM (
        | SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN $revenueExpr END) AS DECIMAL(38,4)) AS promo,
        |  CAST(sum($revenueExpr) AS DECIMAL(38,4)) AS total
        | FROM lineitem JOIN part ON l_partkey = p_partkey)""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
        | SELECT l_suppkey AS supplier_no, sum($revenueExpr) AS total_rev
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1996-04-01'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        | CAST(total_rev AS DECIMAL(38,4))::VARCHAR::DOUBLE AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin,
    "q16_supplier_diversity" ->
      """SELECT p_brand, p_type, p_size,
        | count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM part
        | JOIN (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |  ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |GROUP BY p_brand, p_type, p_size""".stripMargin,
    "q17_small_quantity" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2))::VARCHAR::DOUBLE / 7.0 AS avg_yearly
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN (SELECT l_partkey AS ap_key,
        |        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))::VARCHAR::DOUBLE / count(*) AS avg_qty
        |       FROM lineitem GROUP BY l_partkey) a ON l_partkey = ap_key
        |WHERE p_brand = 'Brand#5' AND l_quantity < 0.4 * avg_qty""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        | GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q18_large_orders" ->
      """SELECT o_orderkey, o_custkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS orderdate, total_qty
        |FROM orders JOIN (
        | SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2))::VARCHAR::DOUBLE AS total_qty
        | FROM lineitem GROUP BY l_orderkey HAVING total_qty > 300) big
        |ON o_orderkey = big.l_orderkey""".stripMargin,
    "q19_disjunctive_revenue" ->
      s"""SELECT CAST(sum($revenueExpr) AS DECIMAL(38,4))::VARCHAR::DOUBLE AS revenue, count(*) AS n_rows
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 20 AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 30 AND p_size BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 40 AND p_size BETWEEN 1 AND 30)""".stripMargin,
    "q22_idle_customers" ->
      """SELECT c_nationkey, count(*) AS numcust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2))::VARCHAR::DOUBLE AS totacctbal
        |FROM customer
        |WHERE c_nationkey % 5 = 0
        |  AND CAST(c_acctbal AS DECIMAL(18,2)) *
        |      (SELECT count(*) FROM customer WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
        |    > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
        |       WHERE CAST(c_acctbal AS DECIMAL(18,2)) > 0)
        |  AND coalesce((SELECT count(*) FROM orders WHERE o_custkey = c_custkey), 0) <= 5
        |GROUP BY c_nationkey""".stripMargin,
    "q_topk_agg_per_customer" ->
      """SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice, rk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        | FROM orders) WHERE rk <= 3""".stripMargin,
    "q_salted_join_orders" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | count(DISTINCT o_custkey) AS n_customers
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q_events_asof_click" ->
      """SELECT user_id, purchase_id, CAST(ts AS TIMESTAMP) AS purchase_ts,
        | CAST(last_click_ts AS TIMESTAMP) AS last_click_ts
        |FROM (
        | SELECT user_id, ts, purchase_id, kind,
        |  max(CASE WHEN kind = 0 THEN ts END) OVER (
        |    PARTITION BY user_id ORDER BY ts, kind
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
        | FROM (
        |  SELECT user_id, ts, CAST(NULL AS BIGINT) AS purchase_id, 0 AS kind
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, event_id AS purchase_id, 1 AS kind
        |  FROM events WHERE event_type = 'purchase'))
        |WHERE kind = 1""".stripMargin
  )
}
