"""tpch registry: TPC-H-style relational benchmark queries.

Query callables + DuckDB oracle twins, split verbatim from
__spark_entry__.py (round 11).  Same driver contract, per-family
files."""

from flink_window_dgim_traffic_spark.registry.common import *  # noqa: F401,F403
from flink_window_dgim_traffic_spark.registry.sqlc import *  # noqa: F401,F403


def queries():
    return {
        "q2_min_cost_supplier": lambda s, d: R.q2_min_cost_supplier(
            _part(s, d), _supplier(s, d), _nation(s, d), _region(s, d),
            _lineitem(s, d),
        ),
        "q11_important_stock": lambda s, d: R.q11_important_stock(
            _lineitem(s, d), _supplier(s, d), _nation(s, d)
        ),
        "q12_late_shipments": lambda s, d: R.q12_late_shipments(
            _lineitem(s, d), _orders(s, d)
        ),
        "q16_supplier_counts": lambda s, d: R.q16_supplier_counts(
            _part(s, d), _supplier(s, d), _lineitem(s, d)
        ),
        "q20_excess_stock": lambda s, d: R.q20_excess_stock(
            _lineitem(s, d), _part(s, d), _supplier(s, d), _nation(s, d)
        ),
        "q21_waiting_suppliers": lambda s, d: R.q21_waiting_suppliers(
            _lineitem(s, d), _orders(s, d), _supplier(s, d)
        ),
        # --- batch relational surface (north star) ---
        "q1_pricing_summary": lambda s, d: R.q1_pricing_summary(_lineitem(s, d)),
        "q18_large_volume_customers": lambda s, d: R.q18_large_volume_customers(
            _customer(s, d), _orders(s, d), _lineitem(s, d)
        ),
        "q6_revenue_change": lambda s, d: R.q6_revenue_change(_lineitem(s, d)),
        # --- TPC-H shapes added round 2 (never driver-verified) ---
        "q4_order_priority": lambda s, d: R.q4_order_priority(
            _orders(s, d), _lineitem(s, d)
        ),
        "q7_volume_shipping": lambda s, d: R.q7_volume_shipping(
            _supplier(s, d),
            _lineitem(s, d),
            _orders(s, d),
            _customer(s, d),
            _nation(s, d),
        ),
        "q8_market_share": lambda s, d: R.q8_market_share(
            _part(s, d),
            _lineitem(s, d),
            _orders(s, d),
            _customer(s, d),
            _supplier(s, d),
            _nation(s, d),
            _region(s, d),
        ),
        "q9_profit": lambda s, d: R.q9_profit(
            _lineitem(s, d), _part(s, d), _supplier(s, d), _nation(s, d)
        ),
        "q10_returned_items": lambda s, d: R.q10_returned_items(
            _customer(s, d), _orders(s, d), _lineitem(s, d), _nation(s, d)
        ),
        "q13_customer_distribution": lambda s, d: R.q13_customer_distribution(
            _customer(s, d), _orders(s, d)
        ),
        "q15_top_supplier": lambda s, d: R.q15_top_supplier(
            _supplier(s, d), _lineitem(s, d)
        ),
        "q17_small_quantity": lambda s, d: R.q17_small_quantity(
            _lineitem(s, d), _part(s, d)
        ),
        "q19_discounted_revenue": lambda s, d: R.q19_discounted_revenue(
            _lineitem(s, d), _part(s, d)
        ),
        "q22_global_sales": lambda s, d: R.q22_global_sales(
            _customer(s, d), _orders(s, d)
        ),
        "nation_party_full_outer": lambda s, d: R.nation_party_full_outer(
            _customer(s, d), _supplier(s, d)
        ),
        "q14_promo_revenue": lambda s, d: R.q14_promo_revenue(
            _lineitem(s, d), _part(s, d)
        ),
        "q3_shipping_priority": lambda s, d: R.q3_shipping_priority(
            _customer(s, d), _orders(s, d), _lineitem(s, d)
        ),
        "q5_local_supplier": lambda s, d: R.q5_local_supplier(
            _customer(s, d),
            _orders(s, d),
            _lineitem(s, d),
            _supplier(s, d),
            _nation(s, d),
            _region(s, d),
        ),
        "top_customers_per_nation": lambda s, d: R.top_customers_per_nation(
            _customer(s, d), _orders(s, d), _nation(s, d)
        ),
        "orders_with_expensive_items": lambda s, d: R.orders_with_expensive_items(
            _orders(s, d), _lineitem(s, d)
        ),
        "nations_without_suppliers": lambda s, d: R.nations_without_suppliers(
            _nation(s, d), _customer(s, d), _supplier(s, d)
        ),
        "party_contact_counts": lambda s, d: R.party_contact_counts(
            _customer(s, d), _supplier(s, d)
        ),
    }


def oracles():
    out = {
        # Adapted TPC-H completion set over the DERIVED partsupp
        # (availqty = exact DECIMAL qty sum, supplycost = exact
        # DECIMAL min line price — no division, engines agree).
        "q2_min_cost_supplier": f"""
WITH {_PS_BASE},
eur AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
tgt AS (SELECT p_partkey FROM part
        WHERE p_type = 'ECONOMY' AND p_size = 15),
offers AS (SELECT p_partkey, s_name, s_acctbal, n_name, ps_supplycost
           FROM ps JOIN tgt ON l_partkey = p_partkey
           JOIN eur ON l_suppkey = s_suppkey),
best AS (SELECT p_partkey AS pk, min(ps_supplycost) AS min_cost
         FROM offers GROUP BY 1)
SELECT p_partkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal, n_name,
       CAST(ps_supplycost AS DOUBLE) AS supplycost
FROM offers JOIN best ON p_partkey = pk AND ps_supplycost = min_cost
""",
        "q11_important_stock": f"""
WITH {_PS_BASE},
nat AS (SELECT s_suppkey FROM supplier JOIN nation
        ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3'),
val AS (SELECT l_partkey AS ps_partkey,
        sum(CAST(ps_supplycost AS DECIMAL(18,2))
            * CAST(ps_availqty AS DECIMAL(18,2))) AS value
        FROM ps JOIN nat ON l_suppkey = s_suppkey GROUP BY 1),
tot AS (SELECT sum(value) AS total_value, count(*) AS n_parts FROM val)
SELECT ps_partkey, CAST(value AS DOUBLE) AS value
FROM val, tot WHERE value * n_parts > 2 * total_value
""",
        "q12_late_shipments": """
SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE date_diff('day', CAST(o_orderdate AS DATE),
                CAST(l_shipdate AS DATE)) > 90
GROUP BY l_returnflag
""",
        "q16_supplier_counts": f"""
WITH {_PS_BASE},
bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM bad)
GROUP BY 1, 2, 3
""",
        "q20_excess_stock": """
WITH per AS (
  SELECT l_partkey, l_suppkey,
    sum(CAST(l_quantity AS DECIMAL(12,2))) AS avail_all,
    sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
        THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS shipped96
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY 1, 2)
SELECT DISTINCT s_suppkey, s_name
FROM per JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
  AND avail_all > 2 * coalesce(shipped96, CAST(0 AS DECIMAL(12,2)))
""",
        "q21_waiting_suppliers": """
WITH li AS (SELECT l_orderkey, l_suppkey,
       date_diff('day', CAST(o_orderdate AS DATE),
                 CAST(l_shipdate AS DATE)) > 60 AS is_late
     FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     WHERE o_orderstatus = 'F'),
per_order AS (SELECT l_orderkey,
       count(DISTINCT l_suppkey) AS n_supp,
       count(DISTINCT CASE WHEN is_late THEN l_suppkey END)
         AS n_late_supp
     FROM li GROUP BY 1),
waits AS (SELECT l_suppkey, count(*) AS numwait FROM (
     SELECT DISTINCT li.l_orderkey, l_suppkey
     FROM li JOIN per_order USING (l_orderkey)
     WHERE is_late AND n_supp > 1 AND n_late_supp = 1)
     GROUP BY 1)
SELECT s_name, CAST(numwait AS BIGINT) AS numwait
FROM waits JOIN supplier ON l_suppkey = s_suppkey
""",
        "q1_pricing_summary": f"""
SELECT l_returnflag, l_linestatus,
 CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
 CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
 CAST(sum({_REV}) AS DOUBLE) AS sum_disc_price,
 CAST(sum({_REV} * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
 count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "q3_shipping_priority": f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
 CAST(sum({_REV}) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
        "q5_local_supplier": f"""
SELECT n_name, CAST(sum({_REV}) AS DOUBLE) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN supplier ON s_nationkey = n_nationkey
JOIN lineitem ON l_suppkey = s_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
        "q18_large_volume_customers": """
WITH big AS (
 SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
 FROM lineitem GROUP BY l_orderkey
 HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > CAST(250.0 AS DECIMAL(12,2)))
SELECT c_custkey, c_name, o_orderkey,
 strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
 CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
 CAST(total_qty AS DOUBLE) AS total_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
        "q14_promo_revenue": f"""
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_REV}
                     ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE) AS promo_revenue,
       CAST(sum({_REV}) AS DOUBLE) AS total_revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-02-01'
""",
        "q4_order_priority": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
        "q7_volume_shipping": f"""
SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
 SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS BIGINT) AS l_year,
        {_REV} AS volume
 FROM lineitem
 JOIN supplier ON s_suppkey = l_suppkey
 JOIN orders ON o_orderkey = l_orderkey
 JOIN customer ON c_custkey = o_custkey
 JOIN nation n1 ON n1.n_nationkey = s_nationkey
 JOIN nation n2 ON n2.n_nationkey = c_nationkey
 WHERE l_shipdate >= TIMESTAMP '1996-01-01'
   AND l_shipdate < TIMESTAMP '1998-01-01'
   AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
GROUP BY supp_nation, cust_nation, l_year
""",
        "q8_market_share": f"""
WITH j AS (
 SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        {_REV} AS volume, n1.n_name AS supp_nation
 FROM lineitem
 JOIN part ON p_partkey = l_partkey AND p_type = 'STANDARD'
 JOIN orders ON o_orderkey = l_orderkey
 JOIN customer ON c_custkey = o_custkey
 JOIN nation n2 ON n2.n_nationkey = c_nationkey
 JOIN region ON r_regionkey = n2.n_regionkey AND r_name = 'ASIA'
 JOIN supplier ON s_suppkey = l_suppkey
 JOIN nation n1 ON n1.n_nationkey = s_nationkey
 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
   AND o_orderdate < TIMESTAMP '1998-01-01')
SELECT o_year,
 CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
               ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE)
   / CAST(sum(volume) AS DOUBLE) AS mkt_share,
 CAST(sum(volume) AS DOUBLE) AS total_revenue
FROM j GROUP BY o_year
""",
        "q9_profit": f"""
SELECT supp_nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
FROM (
 SELECT n_name AS supp_nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        {_REV} - CAST(p_retailprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))
               * CAST(0.5 AS DECIMAL(4,2)) AS amount
 FROM lineitem
 JOIN part ON p_partkey = l_partkey AND p_type = 'ECONOMY'
 JOIN supplier ON s_suppkey = l_suppkey
 JOIN nation ON n_nationkey = s_nationkey)
GROUP BY supp_nation, o_year
""",
        "q10_returned_items": f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
        "q13_customer_distribution": """
SELECT c_count, count(*) AS custdist
FROM (
 SELECT c_custkey, count(o_orderkey) AS c_count
 FROM customer
 LEFT JOIN orders ON o_custkey = c_custkey AND o_orderpriority <> '5-LOW'
 GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
        "q15_top_supplier": f"""
WITH rev AS (
 SELECT l_suppkey, sum({_REV}) AS total_revenue
 FROM lineitem
 WHERE l_shipdate >= TIMESTAMP '1996-01-01'
   AND l_shipdate < TIMESTAMP '1996-04-01'
 GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
""",
        "q17_small_quantity": """
WITH brand_items AS (
 SELECT l_partkey, l_quantity, l_extendedprice
 FROM lineitem JOIN part ON p_partkey = l_partkey
 WHERE p_brand = 'Brand#3'),
per_part AS (
 SELECT l_partkey AS pk,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * 0.2
          / count(*) AS qty_thr
 FROM brand_items GROUP BY l_partkey)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       count(*) AS n_items
FROM brand_items JOIN per_part ON pk = l_partkey
WHERE l_quantity < qty_thr
""",
        "q19_discounted_revenue": f"""
SELECT CAST(sum({_REV}) AS DOUBLE) AS revenue, count(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""",
        "q22_global_sales": """
WITH pool AS (
 SELECT * FROM customer WHERE c_nationkey IN (0,1,2,3,4,5,6)),
ab AS (
 SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
          AS avg_bal
 FROM pool WHERE c_acctbal > 0.0)
SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM pool, ab
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY cntrycode
""",
        "top_customers_per_nation": """
WITH spend AS (
 SELECT n_name, c_custkey, c_name,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
 FROM customer
 JOIN orders ON o_custkey = c_custkey
 JOIN nation ON n_nationkey = c_nationkey
 GROUP BY 1, 2, 3)
SELECT n_name, c_custkey, c_name, total_spend, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY n_name
        ORDER BY total_spend DESC, c_custkey) AS rnk FROM spend) t
WHERE rnk <= 3
""",
        "q6_revenue_change": """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
             CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(l_discount AS DECIMAL(4,2)) >= CAST('0.05' AS DECIMAL(4,2))
  AND CAST(l_discount AS DECIMAL(4,2)) <= CAST('0.07' AS DECIMAL(4,2))
  AND CAST(l_quantity AS DECIMAL(12,2)) < CAST(24 AS DECIMAL(12,2))
""",
        "orders_with_expensive_items": """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
 CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND CAST(l_extendedprice AS DECIMAL(12,2)) >
                    CAST(90000.0 AS DECIMAL(12,2)))
""",
        "nations_without_suppliers": """
SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
EXCEPT
SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
""",
        "party_contact_counts": """
SELECT nationkey, role, count(*) AS n FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS role FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS role FROM supplier
) GROUP BY nationkey, role
""",
        "nation_party_full_outer": """
WITH c AS (SELECT c_nationkey AS nk_c, count(*) AS n_customers
           FROM customer GROUP BY c_nationkey),
s AS (SELECT s_nationkey AS nk_s, count(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey)
SELECT CAST(COALESCE(nk_c, nk_s) AS BIGINT) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON nk_c = nk_s
""",
    }
    return out
