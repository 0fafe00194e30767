package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.TpcDs

/** All 103 query files of the reference's TPC-DS corpus
  * (sdks/java/testing/tpcds/src/main/resources/queries/query{1..99,
  * 14ab,23ab,24ab,39ab}.sql), run over the
  * deterministic multi-channel tables of [[graft.sources.TpcDs]] (store +
  * catalog + web facts and returns, weekly inventory, and their
  * dimensions). The SQL body is SHARED between the
  * Spark run and the DuckDB oracle (which reads the same parquet through
  * WITH-views), so the gate compares the two engines on identical bytes.
  *
  * Minimal, documented adaptations from the reference text — the query
  * shapes (join graphs, grouping, windows, subquery structure) are
  * untouched:
  *  - aggregate outputs are aliased and DECIMAL sums cast to DOUBLE
  *    (exact decimal aggregation inside, portable hashing outside — the
  *    q03 rule);
  *  - q65's `revenue <= 0.1 * avg(revenue)` is rewritten to the exact
  *    integer-free form `revenue * 10 * cnt <= total` (DuckDB computes
  *    decimal AVG in floating point, which flips boundary rows);
  *  - q79 adds ss_ticket_number to ORDER BY (its reference sort key is
  *    not total, and LIMIT under a non-total order is undefined);
  *  - q96/q88's zetasql alias workaround from the reference is kept;
  *  - q9's `avg(decimal)` becomes `cast(sum(..) as double)/nullif(count
  *    (..),0)` (exact decimal sum, one double division — DuckDB's AVG
  *    over DECIMAL accumulates in floating point, and NULLIF keeps the
  *    empty upper quantity buckets NULL under ANSI division);
  *  - q36/q59's decimal÷decimal ratios divide after casting each side to
  *    double (the engines' decimal-division scale/rounding rules differ);
  *    q59's ratio columns gain aliases, incl. the spec's verbatim
  *    `tue_sales1/tue_sales1` typo;
  *  - q67's ORDER BY adds explicit NULLS FIRST on the rollup columns it
  *    truncates under (Spark defaults nulls first ASC, DuckDB nulls last).
  *
  * Scale notes (the corpus is run as written, so these are properties of
  * the reference queries themselves): q65 repeats an identical
  * store_sales aggregation subquery — Catalyst plans two fact scans (no
  * cross-subquery materialization); at 100 TB the production form
  * pre-aggregates (store, item) revenue once into a bucketed table and
  * joins both consumers against it. q88 is eight scalar subqueries over
  * store_sales with different time-band filters — eight fact scans as
  * written; the single-pass form is one scan with eight conditional
  * count aggregates (`count(case when ... end)`). Both single-pass
  * rewrites are ordinary graft aggregations (see q37/q55-style
  * conditional aggs); the corpus entries deliberately keep the reference
  * text to compare engine behavior on the same shape. Same class of
  * note for the round-4 monsters: q14a/b and q23a/b re-scan the three
  * fact tables for their cross_items / avg_sales / frequent-items CTEs
  * (Catalyst plans one scan per consumer — no cross-subquery
  * materialization); at 100 TB the production form materializes each CTE
  * once (`.persist` or a staged table) and the IN-subqueries stay
  * semi-joins, which is how Catalyst already plans them here (verified:
  * SortMergeJoin LeftSemi on the fact side, dims broadcast, zero
  * cartesian products across ds05/ds14/ds23/ds64/ds80).
  */
object TpcDsQueries extends QueryModule {

  private val q3Body =
    """select dt.d_year
      |      ,item.i_brand_id brand_id
      |      ,item.i_brand brand
      |      ,cast(sum(ss_ext_sales_price) as double) sum_agg
      |from  date_dim dt
      |     ,store_sales
      |     ,item
      |where dt.d_date_sk = store_sales.ss_sold_date_sk
      |  and store_sales.ss_item_sk = item.i_item_sk
      |  and item.i_manufact_id = 436
      |  and dt.d_moy=12
      |group by dt.d_year
      |     ,item.i_brand
      |     ,item.i_brand_id
      |order by dt.d_year
      |        ,sum_agg desc
      |        ,brand_id
      |limit 100""".stripMargin

  private val q42Body =
    """select dt.d_year
      |      ,item.i_category_id
      |      ,item.i_category
      |      ,cast(sum(ss_ext_sales_price) as double) sum_sales
      |from  date_dim dt
      |     ,store_sales
      |     ,item
      |where dt.d_date_sk = store_sales.ss_sold_date_sk
      |  and store_sales.ss_item_sk = item.i_item_sk
      |  and item.i_manager_id = 1
      |  and dt.d_moy=12
      |  and dt.d_year=1998
      |group by dt.d_year
      |        ,item.i_category_id
      |        ,item.i_category
      |order by sum_sales desc, dt.d_year
      |        ,item.i_category_id
      |        ,item.i_category
      |limit 100""".stripMargin

  private val q52Body =
    """select dt.d_year
      |      ,item.i_brand_id brand_id
      |      ,item.i_brand brand
      |      ,cast(sum(ss_ext_sales_price) as double) ext_price
      |from date_dim dt
      |    ,store_sales
      |    ,item
      |where dt.d_date_sk = store_sales.ss_sold_date_sk
      |   and store_sales.ss_item_sk = item.i_item_sk
      |   and item.i_manager_id = 1
      |   and dt.d_moy=12
      |   and dt.d_year=1998
      |group by dt.d_year
      |        ,item.i_brand
      |        ,item.i_brand_id
      |order by dt.d_year
      |        ,ext_price desc
      |        ,brand_id
      |limit 100""".stripMargin

  private val q55Body =
    """select i_brand_id brand_id, i_brand brand,
      |       cast(sum(ss_ext_sales_price) as double) ext_price
      |from date_dim, store_sales, item
      |where d_date_sk = ss_sold_date_sk
      |  and ss_item_sk = i_item_sk
      |  and i_manager_id=36
      |  and d_moy=12
      |  and d_year=2001
      |group by i_brand, i_brand_id
      |order by ext_price desc, i_brand_id
      |limit 100""".stripMargin

  private val q65Body =
    """select s_store_name,
      |       i_item_desc,
      |       cast(sc.revenue as double) as revenue,
      |       cast(i_current_price as double) as i_current_price,
      |       cast(i_wholesale_cost as double) as i_wholesale_cost,
      |       i_brand
      |from store, item,
      |    (select ss_store_sk, sum(revenue) as tot, count(*) as cnt
      |       from
      |           (select ss_store_sk, ss_item_sk,
      |                   sum(ss_sales_price) as revenue
      |              from store_sales, date_dim
      |             where ss_sold_date_sk = d_date_sk and d_month_seq between 1212 and 1212+11
      |             group by ss_store_sk, ss_item_sk) sa
      |      group by ss_store_sk) sb,
      |    (select ss_store_sk, ss_item_sk, sum(ss_sales_price) as revenue
      |       from store_sales, date_dim
      |      where ss_sold_date_sk = d_date_sk and d_month_seq between 1212 and 1212+11
      |      group by ss_store_sk, ss_item_sk) sc
      |where sb.ss_store_sk = sc.ss_store_sk and
      |      sc.revenue * 10 * sb.cnt <= sb.tot and
      |      s_store_sk = sc.ss_store_sk and
      |      i_item_sk = sc.ss_item_sk
      |order by s_store_name, i_item_desc
      |limit 100""".stripMargin

  private val q73Body =
    """select c_last_name
      |      ,c_first_name
      |      ,c_salutation
      |      ,c_preferred_cust_flag
      |      ,ss_ticket_number
      |      ,cnt from
      |  (select ss_ticket_number
      |         ,ss_customer_sk
      |         ,count(*) cnt
      |   from store_sales,date_dim,store,household_demographics
      |   where store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |   and store_sales.ss_store_sk = store.s_store_sk
      |   and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
      |   and date_dim.d_dom between 1 and 2
      |   and (household_demographics.hd_buy_potential = '>10000' or
      |        household_demographics.hd_buy_potential = 'Unknown')
      |   and household_demographics.hd_vehicle_count > 0
      |   and case when household_demographics.hd_vehicle_count > 0 then
      |            household_demographics.hd_dep_count/ household_demographics.hd_vehicle_count else null end > 1
      |   and date_dim.d_year in (1998,1998+1,1998+2)
      |   and store.s_county in ('Williamson County','Williamson County','Williamson County','Williamson County')
      |   group by ss_ticket_number,ss_customer_sk) dj,customer
      |   where ss_customer_sk = c_customer_sk
      |     and cnt between 1 and 5
      |   order by cnt desc, c_last_name asc""".stripMargin

  private val q79Body =
    """select
      |  c_last_name,c_first_name,substring(s_city,1,30) as s_city_30,ss_ticket_number,
      |  cast(amt as double) as amt, cast(profit as double) as profit
      |  from
      |   (select ss_ticket_number
      |          ,ss_customer_sk
      |          ,store.s_city
      |          ,sum(ss_coupon_amt) amt
      |          ,sum(ss_net_profit) profit
      |    from store_sales,date_dim,store,household_demographics
      |    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |    and store_sales.ss_store_sk = store.s_store_sk
      |    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
      |    and (household_demographics.hd_dep_count = 8 or household_demographics.hd_vehicle_count > 0)
      |    and date_dim.d_dow = 1
      |    and date_dim.d_year in (1998,1998+1,1998+2)
      |    and store.s_number_employees between 200 and 295
      |    group by ss_ticket_number,ss_customer_sk,ss_addr_sk,store.s_city) ms,customer
      |    where ss_customer_sk = c_customer_sk
      | order by c_last_name,c_first_name,s_city_30, profit, ss_ticket_number
      |limit 100""".stripMargin

  private def q88Block(alias: String, hour: Int, half: String): String = {
    val minuteCond = if (half == "first") "t_minute < 30" else "t_minute >= 30"
    s"""(select count(*) $alias
       | from store_sales, household_demographics , time_dim, store
       | where ss_sold_time_sk = time_dim.t_time_sk
       |     and ss_hdemo_sk = household_demographics.hd_demo_sk
       |     and ss_store_sk = s_store_sk
       |     and time_dim.t_hour = $hour
       |     and time_dim.$minuteCond
       |     and ((household_demographics.hd_dep_count = 3 and household_demographics.hd_vehicle_count<=3+2) or
       |          (household_demographics.hd_dep_count = 0 and household_demographics.hd_vehicle_count<=0+2) or
       |          (household_demographics.hd_dep_count = 1 and household_demographics.hd_vehicle_count<=1+2))
       |     and store.s_store_name = 'ese')""".stripMargin
  }

  private val q88Body =
    s"""select *
       |from
       | ${q88Block("h8_30_to_9", 8, "second")} s1,
       | ${q88Block("h9_to_9_30", 9, "first")} s2,
       | ${q88Block("h9_30_to_10", 9, "second")} s3,
       | ${q88Block("h10_to_10_30", 10, "first")} s4,
       | ${q88Block("h10_30_to_11", 10, "second")} s5,
       | ${q88Block("h11_to_11_30", 11, "first")} s6,
       | ${q88Block("h11_30_to_12", 11, "second")} s7,
       | ${q88Block("h12_to_12_30", 12, "first")} s8""".stripMargin

  private val q96Body =
    """select count(*) as cnt
      |from store_sales
      |    ,household_demographics
      |    ,time_dim, store
      |where ss_sold_time_sk = time_dim.t_time_sk
      |    and ss_hdemo_sk = household_demographics.hd_demo_sk
      |    and ss_store_sk = s_store_sk
      |    and time_dim.t_hour = 8
      |    and time_dim.t_minute >= 30
      |    and household_demographics.hd_dep_count = 5
      |    and store.s_store_name = 'ese'
      |order by cnt
      |limit 100""".stripMargin

  private val q98Body =
    """select i_item_desc
      |      ,i_category
      |      ,i_class
      |      ,cast(i_current_price as double) as i_current_price
      |      ,cast(sum(ss_ext_sales_price) as double) as itemrevenue
      |      ,cast(sum(ss_ext_sales_price) as double)*100/
      |         cast(sum(sum(ss_ext_sales_price)) over (partition by i_class) as double) as revenueratio
      |from
      |	store_sales
      |    	,item
      |    	,date_dim
      |where
      |	ss_item_sk = i_item_sk
      |  	and i_category in ('Jewelry', 'Sports', 'Books')
      |  	and ss_sold_date_sk = d_date_sk
      |	and d_date between cast('2001-01-12' as date)
      |				and (cast('2001-01-12' as date) + interval '30' day)
      |group by
      |	i_item_id
      |        ,i_item_desc
      |        ,i_category
      |        ,i_class
      |        ,i_current_price
      |order by
      |	i_category
      |        ,i_class
      |        ,i_item_id
      |        ,i_item_desc
      |        ,revenueratio""".stripMargin

  private val q43Body =
    """select s_store_name, s_store_id,
      |       cast(sum(case when (d_day_name='Sunday') then ss_sales_price else null end) as double) sun_sales,
      |       cast(sum(case when (d_day_name='Monday') then ss_sales_price else null end) as double) mon_sales,
      |       cast(sum(case when (d_day_name='Tuesday') then ss_sales_price else  null end) as double) tue_sales,
      |       cast(sum(case when (d_day_name='Wednesday') then ss_sales_price else null end) as double) wed_sales,
      |       cast(sum(case when (d_day_name='Thursday') then ss_sales_price else null end) as double) thu_sales,
      |       cast(sum(case when (d_day_name='Friday') then ss_sales_price else null end) as double) fri_sales,
      |       cast(sum(case when (d_day_name='Saturday') then ss_sales_price else null end) as double) sat_sales
      |from date_dim, store_sales, store
      |where d_date_sk = ss_sold_date_sk and
      |      s_store_sk = ss_store_sk and
      |      s_gmt_offset = -5 and
      |      d_year = 1998
      |group by s_store_name, s_store_id
      |order by s_store_name, s_store_id,sun_sales,mon_sales,tue_sales,wed_sales,thu_sales,fri_sales,sat_sales
      |limit 100""".stripMargin

  // q53/q63/q89 deviation predicate, exactly: avg>0 and
  // abs(s - tot/cnt)/(tot/cnt) > 0.1  <=>  tot>0 and 10*|cnt*s - tot| > tot
  // (decimal/integer arithmetic only — DuckDB's floating-point decimal AVG
  // would flip boundary rows). The window aggregate pair (sum, count) over
  // the partition IS the reference's avg-over-window, computed exactly.

  private val q53Body =
    """select i_manufact_id, d_qoy,
      |       cast(ssum as double) sum_sales,
      |       cast(wtot as double) / wcnt as avg_quarterly_sales
      |from
      |(select i_manufact_id, d_qoy,
      |        sum(ss_sales_price) ssum,
      |        sum(sum(ss_sales_price)) over (partition by i_manufact_id) wtot,
      |        count(*) over (partition by i_manufact_id) wcnt
      |from item, store_sales, date_dim, store
      |where ss_item_sk = i_item_sk and
      |ss_sold_date_sk = d_date_sk and
      |ss_store_sk = s_store_sk and
      |d_month_seq in (1212,1212+1,1212+2,1212+3,1212+4,1212+5,1212+6,1212+7,1212+8,1212+9,1212+10,1212+11) and
      |((i_category in ('Books','Children','Electronics') and
      |i_class in ('class_3','class_9','class_5','class_13') and
      |i_brand in ('brand#3','brand#9','brand#5','brand#13'))
      |or(i_category in ('Women','Music','Men') and
      |i_class in ('class_8','class_6','class_7') and
      |i_brand in ('brand#8','brand#6','brand#7')))
      |group by i_manufact_id, d_qoy ) tmp1
      |where wtot > 0 and 10 * abs(wcnt * ssum - wtot) > wtot
      |order by avg_quarterly_sales,
      |         sum_sales,
      |         i_manufact_id, d_qoy
      |limit 100""".stripMargin

  private val q63Body =
    """select i_manager_id, d_moy,
      |       cast(ssum as double) sum_sales,
      |       cast(wtot as double) / wcnt as avg_monthly_sales
      |from
      |(select i_manager_id, d_moy,
      |        sum(ss_sales_price) ssum,
      |        sum(sum(ss_sales_price)) over (partition by i_manager_id) wtot,
      |        count(*) over (partition by i_manager_id) wcnt
      |from item, store_sales, date_dim, store
      |where ss_item_sk = i_item_sk
      |  and ss_sold_date_sk = d_date_sk
      |  and ss_store_sk = s_store_sk
      |  and d_month_seq in (1212,1212+1,1212+2,1212+3,1212+4,1212+5,1212+6,1212+7,1212+8,1212+9,1212+10,1212+11)
      |  and ((    i_category in ('Books','Children','Electronics')
      |        and i_class in ('class_3','class_9','class_5','class_13')
      |        and i_brand in ('brand#3','brand#9','brand#5','brand#13'))
      |     or(    i_category in ('Women','Music','Men')
      |        and i_class in ('class_8','class_6','class_7')
      |        and i_brand in ('brand#8','brand#6','brand#7')))
      |group by i_manager_id, d_moy) tmp1
      |where wtot > 0 and 10 * abs(wcnt * ssum - wtot) > wtot
      |order by i_manager_id
      |        ,avg_monthly_sales
      |        ,sum_sales, d_moy
      |limit 100""".stripMargin

  private val q89Body =
    """select i_category, i_class, i_brand,
      |       s_store_name, s_company_name, d_moy,
      |       cast(ssum as double) sum_sales,
      |       cast(wtot as double) / wcnt as avg_monthly_sales
      |from(
      |select i_category, i_class, i_brand,
      |       s_store_name, s_company_name,
      |       d_moy,
      |       sum(ss_sales_price) ssum,
      |       sum(sum(ss_sales_price)) over
      |         (partition by i_category, i_brand, s_store_name, s_company_name) wtot,
      |       count(*) over
      |         (partition by i_category, i_brand, s_store_name, s_company_name) wcnt
      |from item, store_sales, date_dim, store
      |where ss_item_sk = i_item_sk and
      |      ss_sold_date_sk = d_date_sk and
      |      ss_store_sk = s_store_sk and
      |      d_year in (2000) and
      |        ((i_category in ('Home','Books','Electronics') and
      |          i_class in ('class_4','class_3','class_5','class_14')
      |         )
      |      or (i_category in ('Shoes','Jewelry','Men') and
      |          i_class in ('class_10','class_1','class_7')
      |        ))
      |group by i_category, i_class, i_brand,
      |         s_store_name, s_company_name, d_moy) tmp1
      |where wtot <> 0 and 10 * abs(wcnt * ssum - wtot) > wtot
      |order by cast(ssum as double) - cast(wtot as double) / wcnt, s_store_name,
      |         i_category, i_class, i_brand, d_moy
      |limit 100""".stripMargin

  private def q28Block(alias: String, qLo: Int, qHi: Int, lp: Int,
      cpLo: Double, wc: Int): String =
    s"""(select cast(sum(ss_list_price) as double)/count(ss_list_price) ${alias}_LP
       |      ,count(ss_list_price) ${alias}_CNT
       |      ,count(distinct ss_list_price) ${alias}_CNTD
       | from store_sales
       | where ss_quantity between $qLo and $qHi
       |   and (ss_list_price between $lp and $lp+10
       |        or ss_coupon_amt between $cpLo and $cpLo+1
       |        or ss_wholesale_cost between $wc and $wc+20)) $alias""".stripMargin

  private val q28Body =
    s"""select *
       |from ${q28Block("B1", 1, 5, 11, 0.5, 14)},
       |     ${q28Block("B2", 6, 10, 91, 1.5, 32)},
       |     ${q28Block("B3", 11, 15, 66, 2.5, 4)},
       |     ${q28Block("B4", 16, 20, 142, 3.5, 80)},
       |     ${q28Block("B5", 21, 25, 135, 3.0, 38)},
       |     ${q28Block("B6", 26, 30, 28, 2.0, 42)}
       |limit 100""".stripMargin

  private val q41Body =
    """select distinct(i_product_name)
      |from item i1
      |where i_manufact_id between 742 and 742+40
      |  and (select count(*) as item_cnt
      |       from item
      |       where (i_manufact = i1.i_manufact and
      |       ((i_category = 'Women' and
      |       (i_color = 'orchid' or i_color = 'papaya') and
      |       (i_units = 'Pound' or i_units = 'Lb') and
      |       (i_size = 'petite' or i_size = 'medium')
      |       ) or
      |       (i_category = 'Women' and
      |       (i_color = 'burlywood' or i_color = 'navy') and
      |       (i_units = 'Bundle' or i_units = 'Each') and
      |       (i_size = 'N/A' or i_size = 'extra large')
      |       ) or
      |       (i_category = 'Men' and
      |       (i_color = 'bisque' or i_color = 'azure') and
      |       (i_units = 'N/A' or i_units = 'Tsp') and
      |       (i_size = 'small' or i_size = 'large')
      |       ) or
      |       (i_category = 'Men' and
      |       (i_color = 'chocolate' or i_color = 'cornflower') and
      |       (i_units = 'Bunch' or i_units = 'Gross') and
      |       (i_size = 'petite' or i_size = 'medium')
      |       ))) or
      |      (i_manufact = i1.i_manufact and
      |       ((i_category = 'Women' and
      |       (i_color = 'salmon' or i_color = 'midnight') and
      |       (i_units = 'Oz' or i_units = 'Box') and
      |       (i_size = 'petite' or i_size = 'medium')
      |       ) or
      |       (i_category = 'Women' and
      |       (i_color = 'snow' or i_color = 'steel') and
      |       (i_units = 'Carton' or i_units = 'Tbl') and
      |       (i_size = 'N/A' or i_size = 'extra large')
      |       ) or
      |       (i_category = 'Men' and
      |       (i_color = 'maroon' or i_color = 'ivory') and
      |       (i_units = 'Pound' or i_units = 'Each') and
      |       (i_size = 'small' or i_size = 'large')
      |       ) or
      |       (i_category = 'Men' and
      |       (i_color = 'khaki' or i_color = 'sienna') and
      |       (i_units = 'Bundle' or i_units = 'Gross') and
      |       (i_size = 'petite' or i_size = 'medium')
      |       )))) > 0
      |order by i_product_name
      |limit 100""".stripMargin

  private val q44Body =
    """select asceding.rnk, i1.i_product_name best_performing, i2.i_product_name worst_performing
      |from(select *
      |     from (select item_sk, rank() over (order by rank_col asc) rnk
      |           from (select ss_item_sk item_sk,
      |                        cast(sum(ss_net_profit) as double)/count(ss_net_profit) rank_col,
      |                        sum(ss_net_profit) ssum, count(ss_net_profit) cnt
      |                 from store_sales ss1
      |                 where ss_store_sk = 2
      |                 group by ss_item_sk) V1,
      |                (select sum(ss_net_profit) bsum, count(ss_net_profit) bcnt
      |                 from store_sales
      |                 where ss_store_sk = 2
      |                   and ss_hdemo_sk is null) B
      |           where 10 * cast(ssum as double) * bcnt > 9 * cast(bsum as double) * cnt
      |          ) V11
      |     where rnk < 11) asceding,
      |    (select *
      |     from (select item_sk, rank() over (order by rank_col desc) rnk
      |           from (select ss_item_sk item_sk,
      |                        cast(sum(ss_net_profit) as double)/count(ss_net_profit) rank_col,
      |                        sum(ss_net_profit) ssum, count(ss_net_profit) cnt
      |                 from store_sales ss1
      |                 where ss_store_sk = 2
      |                 group by ss_item_sk) V2,
      |                (select sum(ss_net_profit) bsum, count(ss_net_profit) bcnt
      |                 from store_sales
      |                 where ss_store_sk = 2
      |                   and ss_hdemo_sk is null) B
      |           where 10 * cast(ssum as double) * bcnt > 9 * cast(bsum as double) * cnt
      |          ) V21
      |     where rnk < 11) descending,
      |item i1,
      |item i2
      |where asceding.rnk = descending.rnk
      |  and i1.i_item_sk=asceding.item_sk
      |  and i2.i_item_sk=descending.item_sk
      |order by asceding.rnk, best_performing, worst_performing
      |limit 100""".stripMargin

  private val q47Body =
    """with v1 as(
      | select i_category, i_brand,
      |        s_store_name, s_company_name,
      |        d_year, d_moy,
      |        sum(ss_sales_price) ssum,
      |        sum(sum(ss_sales_price)) over
      |          (partition by i_category, i_brand,
      |                     s_store_name, s_company_name, d_year) wtot,
      |        count(*) over
      |          (partition by i_category, i_brand,
      |                     s_store_name, s_company_name, d_year) wcnt,
      |        rank() over
      |          (partition by i_category, i_brand,
      |                     s_store_name, s_company_name
      |           order by d_year, d_moy) rn
      | from item, store_sales, date_dim, store
      | where ss_item_sk = i_item_sk and
      |       ss_sold_date_sk = d_date_sk and
      |       ss_store_sk = s_store_sk and
      |       (
      |         d_year = 2000 or
      |         ( d_year = 2000-1 and d_moy =12) or
      |         ( d_year = 2000+1 and d_moy =1)
      |       )
      | group by i_category, i_brand,
      |          s_store_name, s_company_name,
      |          d_year, d_moy),
      | v2 as(
      | select v1.i_category, v1.i_brand, v1.s_store_name, v1.s_company_name
      |        ,v1.d_year, v1.d_moy
      |        ,v1.wtot, v1.wcnt
      |        ,v1.ssum, v1_lag.ssum pssum, v1_lead.ssum nssum
      | from v1, v1 v1_lag, v1 v1_lead
      | where v1.i_category = v1_lag.i_category and
      |       v1.i_category = v1_lead.i_category and
      |       v1.i_brand = v1_lag.i_brand and
      |       v1.i_brand = v1_lead.i_brand and
      |       v1.s_store_name = v1_lag.s_store_name and
      |       v1.s_store_name = v1_lead.s_store_name and
      |       v1.s_company_name = v1_lag.s_company_name and
      |       v1.s_company_name = v1_lead.s_company_name and
      |       v1.rn = v1_lag.rn + 1 and
      |       v1.rn = v1_lead.rn - 1)
      |select i_category, d_year, d_moy
      |       ,cast(wtot as double) / wcnt as avg_monthly_sales
      |       ,cast(ssum as double) as sum_sales
      |       ,cast(pssum as double) as psum
      |       ,cast(nssum as double) as nsum
      |from v2
      |where d_year = 2000 and
      |      wtot > 0 and
      |      10 * abs(wcnt * ssum - wtot) > wtot
      |order by cast(ssum as double) - cast(wtot as double) / wcnt,
      |         d_moy, i_category, i_brand, s_store_name, sum_sales, psum, nsum
      |limit 100""".stripMargin

  private val q9Body =
    """select case when (select count(*)
      |                  from store_sales
      |                  where ss_quantity between 1 and 20) > 25437
      |            then (select cast(sum(ss_ext_discount_amt) as double)
      |                         / nullif(count(ss_ext_discount_amt), 0)
      |                  from store_sales
      |                  where ss_quantity between 1 and 20)
      |            else (select cast(sum(ss_net_profit) as double)
      |                         / nullif(count(ss_net_profit), 0)
      |                  from store_sales
      |                  where ss_quantity between 1 and 20) end bucket1 ,
      |       case when (select count(*)
      |                  from store_sales
      |                  where ss_quantity between 21 and 40) > 22746
      |            then (select cast(sum(ss_ext_discount_amt) as double)
      |                         / nullif(count(ss_ext_discount_amt), 0)
      |                  from store_sales
      |                  where ss_quantity between 21 and 40)
      |            else (select cast(sum(ss_net_profit) as double)
      |                         / nullif(count(ss_net_profit), 0)
      |                  from store_sales
      |                  where ss_quantity between 21 and 40) end bucket2,
      |       case when (select count(*)
      |                  from store_sales
      |                  where ss_quantity between 41 and 60) > 9387
      |            then (select cast(sum(ss_ext_discount_amt) as double)
      |                         / nullif(count(ss_ext_discount_amt), 0)
      |                  from store_sales
      |                  where ss_quantity between 41 and 60)
      |            else (select cast(sum(ss_net_profit) as double)
      |                         / nullif(count(ss_net_profit), 0)
      |                  from store_sales
      |                  where ss_quantity between 41 and 60) end bucket3,
      |       case when (select count(*)
      |                  from store_sales
      |                  where ss_quantity between 61 and 80) > 10098
      |            then (select cast(sum(ss_ext_discount_amt) as double)
      |                         / nullif(count(ss_ext_discount_amt), 0)
      |                  from store_sales
      |                  where ss_quantity between 61 and 80)
      |            else (select cast(sum(ss_net_profit) as double)
      |                         / nullif(count(ss_net_profit), 0)
      |                  from store_sales
      |                  where ss_quantity between 61 and 80) end bucket4,
      |       case when (select count(*)
      |                  from store_sales
      |                  where ss_quantity between 81 and 100) > 18213
      |            then (select cast(sum(ss_ext_discount_amt) as double)
      |                         / nullif(count(ss_ext_discount_amt), 0)
      |                  from store_sales
      |                  where ss_quantity between 81 and 100)
      |            else (select cast(sum(ss_net_profit) as double)
      |                         / nullif(count(ss_net_profit), 0)
      |                  from store_sales
      |                  where ss_quantity between 81 and 100) end bucket5
      |from reason
      |where r_reason_sk = 1""".stripMargin

  private val q36Body =
    """select
      |    cast(sum(ss_net_profit) as double)/cast(sum(ss_ext_sales_price) as double) as gross_margin
      |   ,i_category
      |   ,i_class
      |   ,grouping(i_category)+grouping(i_class) as lochierarchy
      |   ,rank() over (
      |        partition by grouping(i_category)+grouping(i_class),
      |        case when grouping(i_class) = 0 then i_category end
      |        order by cast(sum(ss_net_profit) as double)/cast(sum(ss_ext_sales_price) as double) asc) as rank_within_parent
      | from
      |    store_sales
      |   ,date_dim       d1
      |   ,item
      |   ,store
      | where
      |    d1.d_year = 2000
      | and d1.d_date_sk = ss_sold_date_sk
      | and i_item_sk  = ss_item_sk
      | and s_store_sk  = ss_store_sk
      | and s_state in ('TN','TN','TN','TN',
      |                 'TN','TN','TN','TN')
      | group by rollup(i_category,i_class)
      | order by
      |   lochierarchy desc
      |  ,case when lochierarchy = 0 then i_category end
      |  ,rank_within_parent
      |  limit 100""".stripMargin

  private val q59Body =
    """with wss as
      | (select d_week_seq,
      |        ss_store_sk,
      |        cast(sum(case when (d_day_name='Sunday') then ss_sales_price else null end) as double) sun_sales,
      |        cast(sum(case when (d_day_name='Monday') then ss_sales_price else null end) as double) mon_sales,
      |        cast(sum(case when (d_day_name='Tuesday') then ss_sales_price else  null end) as double) tue_sales,
      |        cast(sum(case when (d_day_name='Wednesday') then ss_sales_price else null end) as double) wed_sales,
      |        cast(sum(case when (d_day_name='Thursday') then ss_sales_price else null end) as double) thu_sales,
      |        cast(sum(case when (d_day_name='Friday') then ss_sales_price else null end) as double) fri_sales,
      |        cast(sum(case when (d_day_name='Saturday') then ss_sales_price else null end) as double) sat_sales
      | from store_sales,date_dim
      | where d_date_sk = ss_sold_date_sk
      | group by d_week_seq,ss_store_sk
      | )
      |  select  s_store_name1,s_store_id1,d_week_seq1
      |       ,sun_sales1/sun_sales2 sun_ratio,mon_sales1/mon_sales2 mon_ratio
      |       ,tue_sales1/tue_sales1 tue_ratio,wed_sales1/wed_sales2 wed_ratio,thu_sales1/thu_sales2 thu_ratio
      |       ,fri_sales1/fri_sales2 fri_ratio,sat_sales1/sat_sales2 sat_ratio
      | from
      | (select s_store_name s_store_name1,wss.d_week_seq d_week_seq1
      |        ,s_store_id s_store_id1,sun_sales sun_sales1
      |        ,mon_sales mon_sales1,tue_sales tue_sales1
      |        ,wed_sales wed_sales1,thu_sales thu_sales1
      |        ,fri_sales fri_sales1,sat_sales sat_sales1
      |  from wss,store,date_dim d
      |  where d.d_week_seq = wss.d_week_seq and
      |        ss_store_sk = s_store_sk and
      |        d_month_seq between 1185 and 1185 + 11) y,
      | (select s_store_name s_store_name2,wss.d_week_seq d_week_seq2
      |        ,s_store_id s_store_id2,sun_sales sun_sales2
      |        ,mon_sales mon_sales2,tue_sales tue_sales2
      |        ,wed_sales wed_sales2,thu_sales thu_sales2
      |        ,fri_sales fri_sales2,sat_sales sat_sales2
      |  from wss,store,date_dim d
      |  where d.d_week_seq = wss.d_week_seq and
      |        ss_store_sk = s_store_sk and
      |        d_month_seq between 1185+ 12 and 1185 + 23) x
      | where s_store_id1=s_store_id2
      |   and d_week_seq1=d_week_seq2-52
      | order by s_store_name1,s_store_id1,d_week_seq1
      |limit 100""".stripMargin

  private val q67Body =
    """select  *
      |from (select i_category
      |            ,i_class
      |            ,i_brand
      |            ,i_product_name
      |            ,d_year
      |            ,d_qoy
      |            ,d_moy
      |            ,s_store_id
      |            ,sumsales
      |            ,rank() over (partition by i_category order by sumsales desc) rk
      |      from (select i_category
      |                  ,i_class
      |                  ,i_brand
      |                  ,i_product_name
      |                  ,d_year
      |                  ,d_qoy
      |                  ,d_moy
      |                  ,s_store_id
      |                  ,cast(sum(coalesce(ss_sales_price*ss_quantity,0)) as double) sumsales
      |            from store_sales
      |                ,date_dim
      |                ,store
      |                ,item
      |       where  ss_sold_date_sk=d_date_sk
      |          and ss_item_sk=i_item_sk
      |          and ss_store_sk = s_store_sk
      |          and d_month_seq between 1212 and 1212+11
      |       group by  rollup(i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,s_store_id))dw1) dw2
      |where rk <= 100
      |order by i_category nulls first
      |        ,i_class nulls first
      |        ,i_brand nulls first
      |        ,i_product_name nulls first
      |        ,d_year nulls first
      |        ,d_qoy nulls first
      |        ,d_moy nulls first
      |        ,s_store_id nulls first
      |        ,sumsales
      |        ,rk
      |limit 100""".stripMargin

  private val q70Body =
    """select
      |    cast(sum(ss_net_profit) as double) as total_sum
      |   ,s_state
      |   ,s_county
      |   ,grouping(s_state)+grouping(s_county) as lochierarchy
      |   ,rank() over (
      |        partition by grouping(s_state)+grouping(s_county),
      |        case when grouping(s_county) = 0 then s_state end
      |        order by sum(ss_net_profit) desc) as rank_within_parent
      | from
      |    store_sales
      |   ,date_dim       d1
      |   ,store
      | where
      |    d1.d_month_seq between 1212 and 1212+11
      | and d1.d_date_sk = ss_sold_date_sk
      | and s_store_sk  = ss_store_sk
      | and s_state in
      |             ( select s_state
      |               from  (select s_state as s_state,
      |                             rank() over ( partition by s_state order by sum(ss_net_profit) desc) as ranking
      |                      from   store_sales, store, date_dim
      |                      where  d_month_seq between 1212 and 1212+11
      |                             and d_date_sk = ss_sold_date_sk
      |                             and s_store_sk  = ss_store_sk
      |                      group by s_state
      |                     ) tmp1
      |               where ranking <= 5
      |             )
      | group by rollup(s_state,s_county)
      | order by
      |   lochierarchy desc
      |  ,case when lochierarchy = 0 then s_state end
      |  ,rank_within_parent
      | limit 100""".stripMargin

  private val q7Body =
    """select  i_item_id,
      |        avg(ss_quantity) agg1,
      |        cast(sum(ss_list_price) as double)/count(ss_list_price) agg2,
      |        cast(sum(ss_coupon_amt) as double)/count(ss_coupon_amt) agg3,
      |        cast(sum(ss_sales_price) as double)/count(ss_sales_price) agg4
      | from store_sales, customer_demographics, date_dim, item, promotion
      | where ss_sold_date_sk = d_date_sk and
      |       ss_item_sk = i_item_sk and
      |       ss_cdemo_sk = cd_demo_sk and
      |       ss_promo_sk = p_promo_sk and
      |       cd_gender = 'F' and
      |       cd_marital_status = 'W' and
      |       cd_education_status = 'Primary' and
      |       (p_channel_email = 'N' or p_channel_event = 'N') and
      |       d_year = 1998
      | group by i_item_id
      | order by i_item_id
      | limit 100""".stripMargin

  private val q13Body =
    """select avg(ss_quantity) avg_qty
      |       ,cast(sum(ss_ext_sales_price) as double)/count(ss_ext_sales_price) avg_ext_sales
      |       ,cast(sum(ss_ext_wholesale_cost) as double)/count(ss_ext_wholesale_cost) avg_ext_wholesale
      |       ,cast(sum(ss_ext_wholesale_cost) as double) sum_ext_wholesale
      | from store_sales
      |     ,store
      |     ,customer_demographics
      |     ,household_demographics
      |     ,customer_address
      |     ,date_dim
      | where s_store_sk = ss_store_sk
      | and  ss_sold_date_sk = d_date_sk and d_year = 2001
      | and((ss_hdemo_sk=hd_demo_sk
      |  and cd_demo_sk = ss_cdemo_sk
      |  and cd_marital_status = 'D'
      |  and cd_education_status = '2 yr Degree'
      |  and ss_sales_price between 100.00 and 150.00
      |  and hd_dep_count = 3
      |     )or
      |     (ss_hdemo_sk=hd_demo_sk
      |  and cd_demo_sk = ss_cdemo_sk
      |  and cd_marital_status = 'S'
      |  and cd_education_status = 'Secondary'
      |  and ss_sales_price between 50.00 and 100.00
      |  and hd_dep_count = 1
      |     ) or
      |     (ss_hdemo_sk=hd_demo_sk
      |  and cd_demo_sk = ss_cdemo_sk
      |  and cd_marital_status = 'W'
      |  and cd_education_status = 'Advanced Degree'
      |  and ss_sales_price between 150.00 and 200.00
      |  and hd_dep_count = 1
      |     ))
      | and((ss_addr_sk = ca_address_sk
      |  and ca_country = 'United States'
      |  and ca_state in ('CO', 'IL', 'MN')
      |  and ss_net_profit between 100 and 200
      |     ) or
      |     (ss_addr_sk = ca_address_sk
      |  and ca_country = 'United States'
      |  and ca_state in ('OH', 'MT', 'NM')
      |  and ss_net_profit between 150 and 300
      |     ) or
      |     (ss_addr_sk = ca_address_sk
      |  and ca_country = 'United States'
      |  and ca_state in ('TX', 'MO', 'MI')
      |  and ss_net_profit between 50 and 250
      |     ))""".stripMargin

  private val q19Body =
    """select  i_brand_id brand_id, i_brand brand, i_manufact_id, i_manufact,
      |        cast(sum(ss_ext_sales_price) as double) ext_price
      | from date_dim, store_sales, item,customer,customer_address,store
      | where d_date_sk = ss_sold_date_sk
      |   and ss_item_sk = i_item_sk
      |   and i_manager_id=7
      |   and d_moy=11
      |   and d_year=1999
      |   and ss_customer_sk = c_customer_sk
      |   and c_current_addr_sk = ca_address_sk
      |   and substring(ca_zip,1,5) <> substring(s_zip,1,5)
      |   and ss_store_sk = s_store_sk
      | group by i_brand
      |      ,i_brand_id
      |      ,i_manufact_id
      |      ,i_manufact
      | order by ext_price desc
      |         ,i_brand
      |         ,i_brand_id
      |         ,i_manufact_id
      |         ,i_manufact
      |limit 100""".stripMargin

  private val q27Body =
    """select  i_item_id,
      |        s_state, grouping(s_state) g_state,
      |        avg(ss_quantity) agg1,
      |        cast(sum(ss_list_price) as double)/count(ss_list_price) agg2,
      |        cast(sum(ss_coupon_amt) as double)/count(ss_coupon_amt) agg3,
      |        cast(sum(ss_sales_price) as double)/count(ss_sales_price) agg4
      | from store_sales, customer_demographics, date_dim, store, item
      | where ss_sold_date_sk = d_date_sk and
      |       ss_item_sk = i_item_sk and
      |       ss_store_sk = s_store_sk and
      |       ss_cdemo_sk = cd_demo_sk and
      |       cd_gender = 'F' and
      |       cd_marital_status = 'W' and
      |       cd_education_status = 'Primary' and
      |       d_year = 1998 and
      |       s_state in ('TN','TN', 'TN', 'TN', 'TN', 'TN')
      | group by rollup (i_item_id, s_state)
      | order by i_item_id nulls first
      |         ,s_state nulls first
      | limit 100""".stripMargin

  private val q46Body =
    """select  c_last_name
      |       ,c_first_name
      |       ,ca_city
      |       ,bought_city
      |       ,ss_ticket_number
      |       ,amt,profit
      | from
      |   (select ss_ticket_number
      |          ,ss_customer_sk
      |          ,ca_city bought_city
      |          ,cast(sum(ss_coupon_amt) as double) amt
      |          ,cast(sum(ss_net_profit) as double) profit
      |    from store_sales,date_dim,store,household_demographics,customer_address
      |    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |    and store_sales.ss_store_sk = store.s_store_sk
      |    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
      |    and store_sales.ss_addr_sk = customer_address.ca_address_sk
      |    and (household_demographics.hd_dep_count = 5 or
      |         household_demographics.hd_vehicle_count= 3)
      |    and date_dim.d_dow in (6,0)
      |    and date_dim.d_year in (1999,1999+1,1999+2)
      |    and store.s_city in ('Midway','Fairview','Fairview','Midway','Fairview')
      |    group by ss_ticket_number,ss_customer_sk,ss_addr_sk,ca_city) dn,customer,customer_address current_addr
      |    where ss_customer_sk = c_customer_sk
      |      and customer.c_current_addr_sk = current_addr.ca_address_sk
      |      and current_addr.ca_city <> bought_city
      |  order by c_last_name
      |          ,c_first_name
      |          ,ca_city
      |          ,bought_city
      |          ,ss_ticket_number
      |  limit 100""".stripMargin

  private val q48Body =
    """select cast(sum (ss_quantity) as bigint) sum_qty
      | from store_sales, store, customer_demographics, customer_address, date_dim
      | where s_store_sk = ss_store_sk
      | and  ss_sold_date_sk = d_date_sk and d_year = 1998
      | and
      | (
      |  (
      |   cd_demo_sk = ss_cdemo_sk
      |   and
      |   cd_marital_status = 'M'
      |   and
      |   cd_education_status = '4 yr Degree'
      |   and
      |   ss_sales_price between 100.00 and 150.00
      |   )
      | or
      |  (
      |  cd_demo_sk = ss_cdemo_sk
      |   and
      |   cd_marital_status = 'D'
      |   and
      |   cd_education_status = 'Primary'
      |   and
      |   ss_sales_price between 50.00 and 100.00
      |  )
      | or
      | (
      |  cd_demo_sk = ss_cdemo_sk
      |  and
      |   cd_marital_status = 'U'
      |   and
      |   cd_education_status = 'Advanced Degree'
      |   and
      |   ss_sales_price between 150.00 and 200.00
      | )
      | )
      | and
      | (
      |  (
      |  ss_addr_sk = ca_address_sk
      |  and
      |  ca_country = 'United States'
      |  and
      |  ca_state in ('KY', 'GA', 'NM')
      |  and ss_net_profit between 0 and 2000
      |  )
      | or
      |  (ss_addr_sk = ca_address_sk
      |  and
      |  ca_country = 'United States'
      |  and
      |  ca_state in ('MT', 'OR', 'IN')
      |  and ss_net_profit between 150 and 3000
      |  )
      | or
      |  (ss_addr_sk = ca_address_sk
      |  and
      |  ca_country = 'United States'
      |  and
      |  ca_state in ('WI', 'MO', 'WV')
      |  and ss_net_profit between 50 and 25000
      |  )
      | )""".stripMargin

  private val q68Body =
    """select  c_last_name
      |       ,c_first_name
      |       ,ca_city
      |       ,bought_city
      |       ,ss_ticket_number
      |       ,extended_price
      |       ,extended_tax
      |       ,list_price
      | from (select ss_ticket_number
      |             ,ss_customer_sk
      |             ,ca_city bought_city
      |             ,cast(sum(ss_ext_sales_price) as double) extended_price
      |             ,cast(sum(ss_ext_list_price) as double) list_price
      |             ,cast(sum(ss_ext_tax) as double) extended_tax
      |       from store_sales
      |           ,date_dim
      |           ,store
      |           ,household_demographics
      |           ,customer_address
      |       where store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |         and store_sales.ss_store_sk = store.s_store_sk
      |        and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
      |        and store_sales.ss_addr_sk = customer_address.ca_address_sk
      |        and date_dim.d_dom between 1 and 2
      |        and (household_demographics.hd_dep_count = 5 or
      |             household_demographics.hd_vehicle_count= 3)
      |        and date_dim.d_year in (1999,1999+1,1999+2)
      |        and store.s_city in ('Midway','Fairview')
      |       group by ss_ticket_number
      |               ,ss_customer_sk
      |               ,ss_addr_sk,ca_city) dn
      |      ,customer
      |      ,customer_address current_addr
      | where ss_customer_sk = c_customer_sk
      |   and customer.c_current_addr_sk = current_addr.ca_address_sk
      |   and current_addr.ca_city <> bought_city
      | order by c_last_name
      |         ,ss_ticket_number
      |limit 100""".stripMargin

  private val q1Body =
    """with customer_total_return as
      |(select sr_customer_sk as ctr_customer_sk
      |,sr_store_sk as ctr_store_sk
      |,sum(sr_fee) as ctr_total_return
      |from store_returns
      |,date_dim
      |where sr_returned_date_sk = d_date_sk
      |and d_year =2000
      |group by sr_customer_sk
      |,sr_store_sk)
      | select  c_customer_id
      |from customer_total_return ctr1
      |,store
      |,customer
      |where 10 * ctr1.ctr_total_return * (select count(ctr_total_return)
      |from customer_total_return ctr2
      |where ctr1.ctr_store_sk = ctr2.ctr_store_sk) > 12 * (select sum(ctr_total_return)
      |from customer_total_return ctr2
      |where ctr1.ctr_store_sk = ctr2.ctr_store_sk)
      |and s_store_sk = ctr1.ctr_store_sk
      |and s_state = 'TN'
      |and ctr1.ctr_customer_sk = c_customer_sk
      |order by c_customer_id
      |limit 100""".stripMargin

  private val q50Body =
    """select
      |   s_store_name
      |  ,s_company_id
      |  ,s_street_number
      |  ,s_street_name
      |  ,s_street_type
      |  ,s_suite_number
      |  ,s_city
      |  ,s_county
      |  ,s_state
      |  ,s_zip
      |  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk <= 30 ) then 1 else 0 end) as bigint)  as d30
      |  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk > 30) and
      |                 (sr_returned_date_sk - ss_sold_date_sk <= 60) then 1 else 0 end ) as bigint)  as d31_60
      |  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk > 60) and
      |                 (sr_returned_date_sk - ss_sold_date_sk <= 90) then 1 else 0 end) as bigint)  as d61_90
      |  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk > 90) and
      |                 (sr_returned_date_sk - ss_sold_date_sk <= 120) then 1 else 0 end) as bigint)  as d91_120
      |  ,cast(sum(case when (sr_returned_date_sk - ss_sold_date_sk  > 120) then 1 else 0 end) as bigint)  as d120_plus
      |from
      |   store_sales
      |  ,store_returns
      |  ,store
      |  ,date_dim d1
      |  ,date_dim d2
      |where
      |    d2.d_year = 2000
      |and d2.d_moy  = 9
      |and ss_ticket_number = sr_ticket_number
      |and ss_item_sk = sr_item_sk
      |and ss_sold_date_sk   = d1.d_date_sk
      |and sr_returned_date_sk   = d2.d_date_sk
      |and ss_customer_sk = sr_customer_sk
      |and ss_store_sk = s_store_sk
      |group by
      |   s_store_name
      |  ,s_company_id
      |  ,s_street_number
      |  ,s_street_name
      |  ,s_street_type
      |  ,s_suite_number
      |  ,s_city
      |  ,s_county
      |  ,s_state
      |  ,s_zip
      |order by s_store_name
      |        ,s_company_id
      |        ,s_street_number
      |        ,s_street_name
      |        ,s_street_type
      |        ,s_suite_number
      |        ,s_city
      |        ,s_county
      |        ,s_state
      |        ,s_zip
      |limit 100""".stripMargin

  private val q6Body =
    """select  a.ca_state state, cast(count(*) as bigint) cnt
      | from customer_address a
      |     ,customer c
      |     ,store_sales s
      |     ,date_dim d
      |     ,item i
      | where       a.ca_address_sk = c.c_current_addr_sk
      |        and c.c_customer_sk = s.ss_customer_sk
      |        and s.ss_sold_date_sk = d.d_date_sk
      |        and s.ss_item_sk = i.i_item_sk
      |        and d.d_month_seq =
      |             (select distinct (d_month_seq)
      |              from date_dim
      |               where d_year = 2000
      |                and d_moy = 2 )
      |        and 10 * i.i_current_price * (select count(j.i_current_price)
      |             from item j
      |             where j.i_category = i.i_category) > 12 *
      |            (select sum(j.i_current_price)
      |             from item j
      |             where j.i_category = i.i_category)
      | group by a.ca_state
      | having count(*) >= 10
      | order by cnt, a.ca_state
      | limit 100""".stripMargin

  private val q61Body =
    """select  promotions,total,cast(promotions as double)/cast(total as double)*100 promo_pct
      |from
      |  (select cast(sum(ss_ext_sales_price) as double) promotions
      |   from  store_sales
      |        ,store
      |        ,promotion
      |        ,date_dim
      |        ,customer
      |        ,customer_address
      |        ,item
      |   where ss_sold_date_sk = d_date_sk
      |   and   ss_store_sk = s_store_sk
      |   and   ss_promo_sk = p_promo_sk
      |   and   ss_customer_sk= c_customer_sk
      |   and   ca_address_sk = c_current_addr_sk
      |   and   ss_item_sk = i_item_sk
      |   and   ca_gmt_offset = -7
      |   and   i_category = 'Books'
      |   and   (p_channel_dmail = 'Y' or p_channel_email = 'Y' or p_channel_tv = 'Y')
      |   and   s_gmt_offset = -7
      |   and   d_year = 1999
      |   and   d_moy  = 11) promotional_sales,
      |  (select cast(sum(ss_ext_sales_price) as double) total
      |   from  store_sales
      |        ,store
      |        ,date_dim
      |        ,customer
      |        ,customer_address
      |        ,item
      |   where ss_sold_date_sk = d_date_sk
      |   and   ss_store_sk = s_store_sk
      |   and   ss_customer_sk= c_customer_sk
      |   and   ca_address_sk = c_current_addr_sk
      |   and   ss_item_sk = i_item_sk
      |   and   ca_gmt_offset = -7
      |   and   i_category = 'Books'
      |   and   s_gmt_offset = -7
      |   and   d_year = 1999
      |   and   d_moy  = 11) all_sales
      |order by promotions, total
      |limit 100""".stripMargin

  private val q93Body =
    """select  ss_customer_sk
      |            ,cast(sum(act_sales) as double) sumsales
      |      from (select ss_item_sk
      |                  ,ss_ticket_number
      |                  ,ss_customer_sk
      |                  ,case when sr_return_quantity is not null then (ss_quantity-sr_return_quantity)*ss_sales_price
      |                                                            else (ss_quantity*ss_sales_price) end act_sales
      |            from store_sales left outer join store_returns on (sr_item_sk = ss_item_sk
      |                                                               and sr_ticket_number = ss_ticket_number)
      |                ,reason
      |            where sr_reason_sk = r_reason_sk
      |              and r_reason_desc = 'Did not like the warranty') t
      |      group by ss_customer_sk
      |      order by sumsales, ss_customer_sk
      |limit 100""".stripMargin

  private def q24Body(color: String) =
    s"""with ssales as
       | (select c_last_name, c_first_name, s_store_name, ca_state, s_state, i_color,
       |        i_current_price, i_manager_id, i_units, i_size, sum(ss_net_paid) netpaid
       | from store_sales, store_returns, store, item, customer, customer_address
       | where ss_ticket_number = sr_ticket_number
       |   and ss_item_sk = sr_item_sk
       |   and ss_customer_sk = c_customer_sk
       |   and ss_item_sk = i_item_sk
       |   and ss_store_sk = s_store_sk
       |   and c_birth_country = upper(ca_country)
       |   and s_zip = ca_zip
       | and s_market_id = 8
       | group by c_last_name, c_first_name, s_store_name, ca_state, s_state, i_color,
       |          i_current_price, i_manager_id, i_units, i_size)
       | select c_last_name, c_first_name, s_store_name, cast(sum(netpaid) as double) paid
       | from ssales
       | where i_color = '$color'
       | group by c_last_name, c_first_name, s_store_name
       | having 20 * sum(netpaid) * (select count(netpaid) from ssales) > (select sum(netpaid) from ssales)""".stripMargin

  // ---- cross-channel corpus (catalog_sales / web_sales / inventory).
  // Adaptations follow the house rules (decimal sums cast to double at
  // output, decimal÷decimal through double, sum(int) cast to bigint for
  // DuckDB's HUGEINT, space-bearing aliases renamed — backtick quoting is
  // not portable), plus per-query notes inline.

  // query2.sql: web+catalog weekly sales, year-over-year ratio per day
  // of week. Our continuous d_week_seq advances 52/year (no 53-week
  // restart), so the reference's `d_week_seq2-53` becomes -52.
  private val q2Body =
    """with wscs as
      | (select sold_date_sk
      |        ,sales_price
      |  from (select ws_sold_date_sk sold_date_sk
      |              ,ws_ext_sales_price sales_price
      |        from web_sales
      |        union all
      |        select cs_sold_date_sk sold_date_sk
      |              ,cs_ext_sales_price sales_price
      |        from catalog_sales)),
      | wswscs as
      | (select d_week_seq,
      |        sum(case when (d_day_name='Sunday') then sales_price else null end) sun_sales,
      |        sum(case when (d_day_name='Monday') then sales_price else null end) mon_sales,
      |        sum(case when (d_day_name='Tuesday') then sales_price else  null end) tue_sales,
      |        sum(case when (d_day_name='Wednesday') then sales_price else null end) wed_sales,
      |        sum(case when (d_day_name='Thursday') then sales_price else null end) thu_sales,
      |        sum(case when (d_day_name='Friday') then sales_price else null end) fri_sales,
      |        sum(case when (d_day_name='Saturday') then sales_price else null end) sat_sales
      | from wscs
      |     ,date_dim
      | where d_date_sk = sold_date_sk
      | group by d_week_seq)
      | select d_week_seq1
      |       ,round(cast(sun_sales1 as double)/cast(sun_sales2 as double),2) sun_ratio
      |       ,round(cast(mon_sales1 as double)/cast(mon_sales2 as double),2) mon_ratio
      |       ,round(cast(tue_sales1 as double)/cast(tue_sales2 as double),2) tue_ratio
      |       ,round(cast(wed_sales1 as double)/cast(wed_sales2 as double),2) wed_ratio
      |       ,round(cast(thu_sales1 as double)/cast(thu_sales2 as double),2) thu_ratio
      |       ,round(cast(fri_sales1 as double)/cast(fri_sales2 as double),2) fri_ratio
      |       ,round(cast(sat_sales1 as double)/cast(sat_sales2 as double),2) sat_ratio
      | from
      | (select wswscs.d_week_seq d_week_seq1
      |        ,sun_sales sun_sales1
      |        ,mon_sales mon_sales1
      |        ,tue_sales tue_sales1
      |        ,wed_sales wed_sales1
      |        ,thu_sales thu_sales1
      |        ,fri_sales fri_sales1
      |        ,sat_sales sat_sales1
      |  from wswscs,date_dim
      |  where date_dim.d_week_seq = wswscs.d_week_seq and
      |        d_year = 2001) y,
      | (select wswscs.d_week_seq d_week_seq2
      |        ,sun_sales sun_sales2
      |        ,mon_sales mon_sales2
      |        ,tue_sales tue_sales2
      |        ,wed_sales wed_sales2
      |        ,thu_sales thu_sales2
      |        ,fri_sales fri_sales2
      |        ,sat_sales sat_sales2
      |  from wswscs
      |      ,date_dim
      |  where date_dim.d_week_seq = wswscs.d_week_seq and
      |        d_year = 2001+1) z
      | where d_week_seq1=d_week_seq2-52
      | order by d_week_seq1""".stripMargin

  // query11.sql: customers whose web year-over-year growth beats their
  // store growth. The growth-ratio comparison goes through double (the
  // engines' decimal-division scale rules differ).
  private val q11Body =
    """with year_total as (
      | select c_customer_id customer_id
      |       ,c_first_name customer_first_name
      |       ,c_last_name customer_last_name
      |       ,c_preferred_cust_flag customer_preferred_cust_flag
      |       ,c_birth_country customer_birth_country
      |       ,c_login customer_login
      |       ,c_email_address customer_email_address
      |       ,d_year dyear
      |       ,sum(ss_ext_list_price-ss_ext_discount_amt) year_total
      |       ,'s' sale_type
      | from customer
      |     ,store_sales
      |     ,date_dim
      | where c_customer_sk = ss_customer_sk
      |   and ss_sold_date_sk = d_date_sk
      | group by c_customer_id
      |         ,c_first_name
      |         ,c_last_name
      |         ,c_preferred_cust_flag
      |         ,c_birth_country
      |         ,c_login
      |         ,c_email_address
      |         ,d_year
      | union all
      | select c_customer_id customer_id
      |       ,c_first_name customer_first_name
      |       ,c_last_name customer_last_name
      |       ,c_preferred_cust_flag customer_preferred_cust_flag
      |       ,c_birth_country customer_birth_country
      |       ,c_login customer_login
      |       ,c_email_address customer_email_address
      |       ,d_year dyear
      |       ,sum(ws_ext_list_price-ws_ext_discount_amt) year_total
      |       ,'w' sale_type
      | from customer
      |     ,web_sales
      |     ,date_dim
      | where c_customer_sk = ws_bill_customer_sk
      |   and ws_sold_date_sk = d_date_sk
      | group by c_customer_id
      |         ,c_first_name
      |         ,c_last_name
      |         ,c_preferred_cust_flag
      |         ,c_birth_country
      |         ,c_login
      |         ,c_email_address
      |         ,d_year
      |         )
      |  select
      |                  t_s_secyear.customer_id
      |                 ,t_s_secyear.customer_first_name
      |                 ,t_s_secyear.customer_last_name
      |                 ,t_s_secyear.customer_email_address
      | from year_total t_s_firstyear
      |     ,year_total t_s_secyear
      |     ,year_total t_w_firstyear
      |     ,year_total t_w_secyear
      | where t_s_secyear.customer_id = t_s_firstyear.customer_id
      |         and t_s_firstyear.customer_id = t_w_secyear.customer_id
      |         and t_s_firstyear.customer_id = t_w_firstyear.customer_id
      |         and t_s_firstyear.sale_type = 's'
      |         and t_w_firstyear.sale_type = 'w'
      |         and t_s_secyear.sale_type = 's'
      |         and t_w_secyear.sale_type = 'w'
      |         and t_s_firstyear.dyear = 2001
      |         and t_s_secyear.dyear = 2001+1
      |         and t_w_firstyear.dyear = 2001
      |         and t_w_secyear.dyear = 2001+1
      |         and t_s_firstyear.year_total > 0
      |         and t_w_firstyear.year_total > 0
      |         and case when t_w_firstyear.year_total > 0 then cast(t_w_secyear.year_total as double) / cast(t_w_firstyear.year_total as double) else 0.0 end
      |             > case when t_s_firstyear.year_total > 0 then cast(t_s_secyear.year_total as double) / cast(t_s_firstyear.year_total as double) else 0.0 end
      | order by t_s_secyear.customer_id
      |         ,t_s_secyear.customer_first_name
      |         ,t_s_secyear.customer_last_name
      |         ,t_s_secyear.customer_email_address
      |limit 100""".stripMargin

  // query16.sql: catalog orders shipped from multiple warehouses with no
  // return, within 60 days. ca_state/cc_county literals adapted to the
  // generator's domains; the space-bearing aliases are renamed.
  private val q16Body =
    """select
      |   cast(count(distinct cs_order_number) as bigint) as order_count
      |  ,cast(sum(cs_ext_ship_cost) as double) as total_shipping_cost
      |  ,cast(sum(cs_net_profit) as double) as total_net_profit
      |from
      |   catalog_sales cs1
      |  ,date_dim
      |  ,customer_address
      |  ,call_center
      |where
      |    d_date between '2001-4-01' and
      |           (cast('2001-4-01' as date) + interval '60' day)
      |and cs1.cs_ship_date_sk = d_date_sk
      |and cs1.cs_bill_addr_sk = ca_address_sk
      |and ca_state = 'GA'
      |and cs1.cs_call_center_sk = cc_call_center_sk
      |and cc_county in ('Williamson County','Levy County','Huron County','Franklin Parish',
      |                  'Daviess County'
      |)
      |and exists (select *
      |            from catalog_sales cs2
      |            where cs1.cs_order_number = cs2.cs_order_number
      |              and cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
      |and not exists(select *
      |               from catalog_returns cr1
      |               where cs1.cs_order_number = cr1.cr_order_number)
      |order by order_count
      |limit 100""".stripMargin

  // query21.sql: inventory quantity before/after a price-change date per
  // warehouse/item. sum(int) casts to bigint (DuckDB sums ints to
  // HUGEINT), which also makes the 2/3..3/2 ratio double/double.
  private val q21Body =
    """select  *
      | from(select w_warehouse_name
      |            ,i_item_id
      |            ,cast(sum(case when (cast(d_date as date) < cast ('1998-04-08' as date))
      |                 then inv_quantity_on_hand
      |                      else 0 end) as bigint) as inv_before
      |            ,cast(sum(case when (cast(d_date as date) >= cast ('1998-04-08' as date))
      |                      then inv_quantity_on_hand
      |                      else 0 end) as bigint) as inv_after
      |   from inventory
      |       ,warehouse
      |       ,item
      |       ,date_dim
      |   where i_current_price between 0.99 and 1.49
      |     and i_item_sk          = inv_item_sk
      |     and inv_warehouse_sk   = w_warehouse_sk
      |     and inv_date_sk    = d_date_sk
      |     and d_date between (cast ('1998-04-08' as date) - interval '30' day)
      |                    and (cast ('1998-04-08' as date) + interval '30' day)
      |   group by w_warehouse_name, i_item_id) x
      | where (case when inv_before > 0
      |             then inv_after / inv_before
      |             else null
      |             end) between 2.0/3.0 and 3.0/2.0
      | order by w_warehouse_name
      |         ,i_item_id
      | limit 100""".stripMargin

  // query22.sql: average quantity-on-hand over the item hierarchy rollup.
  // ORDER BY gains explicit NULLS FIRST on the rollup columns (the q67
  // rule: Spark sorts nulls first ASC, DuckDB last).
  private val q22Body =
    """select  i_product_name
      |             ,i_brand
      |             ,i_class
      |             ,i_category
      |             ,avg(inv_quantity_on_hand) qoh
      |       from inventory
      |           ,date_dim
      |           ,item
      |       where inv_date_sk=d_date_sk
      |              and inv_item_sk=i_item_sk
      |              and d_month_seq between 1212 and 1212 + 11
      |       group by rollup(i_product_name
      |                       ,i_brand
      |                       ,i_class
      |                       ,i_category)
      |order by qoh, i_product_name nulls first, i_brand nulls first,
      |         i_class nulls first, i_category nulls first
      |limit 100""".stripMargin

  // query25.sql: items sold in April, returned within 6 months, and
  // re-bought by the same customer through the catalog — a 3-fact join
  // chain over (customer, item). Year adapted to 2000 (in-domain).
  private val q25Body =
    """select
      | i_item_id
      | ,i_item_desc
      | ,s_store_id
      | ,s_store_name
      | ,cast(sum(ss_net_profit) as double) as store_sales_profit
      | ,cast(sum(sr_net_loss) as double) as store_returns_loss
      | ,cast(sum(cs_net_profit) as double) as catalog_sales_profit
      | from
      | store_sales
      | ,store_returns
      | ,catalog_sales
      | ,date_dim d1
      | ,date_dim d2
      | ,date_dim d3
      | ,store
      | ,item
      | where
      | d1.d_moy = 4
      | and d1.d_year = 2000
      | and d1.d_date_sk = ss_sold_date_sk
      | and i_item_sk = ss_item_sk
      | and s_store_sk = ss_store_sk
      | and ss_customer_sk = sr_customer_sk
      | and ss_item_sk = sr_item_sk
      | and ss_ticket_number = sr_ticket_number
      | and sr_returned_date_sk = d2.d_date_sk
      | and d2.d_moy               between 4 and  10
      | and d2.d_year              = 2000
      | and sr_customer_sk = cs_bill_customer_sk
      | and sr_item_sk = cs_item_sk
      | and cs_sold_date_sk = d3.d_date_sk
      | and d3.d_moy               between 4 and  10
      | and d3.d_year              = 2000
      | group by
      | i_item_id
      | ,i_item_desc
      | ,s_store_id
      | ,s_store_name
      | order by
      | i_item_id
      | ,i_item_desc
      | ,s_store_id
      | ,s_store_name""".stripMargin

  // query29.sql: like q25 on quantities, with a 3-year catalog window.
  // Integer-quantity sums cast to bigint (the DuckDB HUGEINT rule).
  private val q29Body =
    """select
      |     i_item_id
      |    ,i_item_desc
      |    ,s_store_id
      |    ,s_store_name
      |    ,cast(sum(ss_quantity) as bigint)        as store_sales_quantity
      |    ,cast(sum(sr_return_quantity) as bigint) as store_returns_quantity
      |    ,cast(sum(cs_quantity) as bigint)        as catalog_sales_quantity
      | from
      |    store_sales
      |   ,store_returns
      |   ,catalog_sales
      |   ,date_dim             d1
      |   ,date_dim             d2
      |   ,date_dim             d3
      |   ,store
      |   ,item
      | where
      |     d1.d_moy               = 4
      | and d1.d_year              = 1999
      | and d1.d_date_sk           = ss_sold_date_sk
      | and i_item_sk              = ss_item_sk
      | and s_store_sk             = ss_store_sk
      | and ss_customer_sk         = sr_customer_sk
      | and ss_item_sk             = sr_item_sk
      | and ss_ticket_number       = sr_ticket_number
      | and sr_returned_date_sk    = d2.d_date_sk
      | and d2.d_moy               between 4 and  4 + 3
      | and d2.d_year              = 1999
      | and sr_customer_sk         = cs_bill_customer_sk
      | and sr_item_sk             = cs_item_sk
      | and cs_sold_date_sk        = d3.d_date_sk
      | and d3.d_year              in (1999,1999+1,1999+2)
      | group by
      |    i_item_id
      |   ,i_item_desc
      |   ,s_store_id
      |   ,s_store_name
      | order by
      |    i_item_id
      |   ,i_item_desc
      |   ,s_store_id
      |   ,s_store_name
      | limit 100""".stripMargin

  // query37.sql: catalog items in a price/manufacturer band with healthy
  // inventory. Manufacturer ids adapted to the generator's hash domain.
  private val q37Body =
    """select  i_item_id
      |       ,i_item_desc
      |       ,cast(i_current_price as double) as i_current_price
      | from item, inventory, date_dim, catalog_sales
      | where i_current_price between 22 and 22 + 30
      | and inv_item_sk = i_item_sk
      | and d_date_sk=inv_date_sk
      | and d_date between cast('2001-06-02' as date) and (cast('2001-06-02' as date) +  interval '60' day)
      | and i_manufact_id in (678,964,918,849)
      | and inv_quantity_on_hand between 100 and 500
      | and cs_item_sk = i_item_sk
      | group by i_item_id,i_item_desc,i_current_price
      | order by i_item_id
      | limit 100""".stripMargin

  // query82.sql: the store-channel analog of q37.
  private val q82Body =
    """select  i_item_id
      |       ,i_item_desc
      |       ,cast(i_current_price as double) as i_current_price
      | from item, inventory, date_dim, store_sales
      | where i_current_price between 30 and 30+30
      | and inv_item_sk = i_item_sk
      | and d_date_sk=inv_date_sk
      | and d_date between cast('2002-05-30' as date) and (cast('2002-05-30' as date) +  interval '60' day)
      | and i_manufact_id in (437,129,727,663)
      | and inv_quantity_on_hand between 100 and 500
      | and ss_item_sk = i_item_sk
      | group by i_item_id,i_item_desc,i_current_price
      | order by i_item_id
      | limit 100""".stripMargin

  // query40.sql: catalog sales net of refunds by warehouse state,
  // before/after a price-change date (left join to returns).
  private val q40Body =
    """select
      |   w_state
      |  ,i_item_id
      |  ,cast(sum(case when (cast(d_date as date) < cast ('1998-04-08' as date))
      | 		then cs_sales_price - coalesce(cr_refunded_cash,0) else 0 end) as double) as sales_before
      |  ,cast(sum(case when (cast(d_date as date) >= cast ('1998-04-08' as date))
      | 		then cs_sales_price - coalesce(cr_refunded_cash,0) else 0 end) as double) as sales_after
      | from
      |   catalog_sales left outer join catalog_returns on
      |       (cs_order_number = cr_order_number
      |        and cs_item_sk = cr_item_sk)
      |  ,warehouse
      |  ,item
      |  ,date_dim
      | where
      |     i_current_price between 0.99 and 1.49
      | and i_item_sk          = cs_item_sk
      | and cs_warehouse_sk    = w_warehouse_sk
      | and cs_sold_date_sk    = d_date_sk
      | and d_date between (cast ('1998-04-08' as date) - interval '30' day)
      |                and (cast ('1998-04-08' as date) + interval '30' day)
      | group by
      |    w_state,i_item_id
      | order by w_state,i_item_id
      |limit 100""".stripMargin

  // query45.sql: web sales by customer zip/county for a zip list OR a
  // prime-item-sk list (the item branch keeps the result non-empty
  // whatever the hashed zip values are).
  private val q45Body =
    """select  ca_zip, ca_county, cast(sum(ws_sales_price) as double) sum_sales
      | from web_sales, customer, customer_address, date_dim, item
      | where ws_bill_customer_sk = c_customer_sk
      | 	and c_current_addr_sk = ca_address_sk
      | 	and ws_item_sk = i_item_sk
      | 	and ( substring(ca_zip,1,5) in ('85669', '86197','88274','83405','86475', '85392', '85460', '80348', '81792')
      | 	      or
      | 	      i_item_id in (select i_item_id
      |                             from item
      |                             where i_item_sk in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)
      |                             )
      | 	    )
      | 	and ws_sold_date_sk = d_date_sk
      | 	and d_qoy = 2 and d_year = 2000
      | group by ca_zip, ca_county
      | order by ca_zip, ca_county
      | limit 100""".stripMargin

  // query92.sql: web discounts more than 1.3x the item's average over the
  // window. The correlated average goes through exact-decimal-sum /
  // double-division (the q9 rule) so the 1.3x boundary is engine-stable.
  private val q92Body =
    """select
      |   cast(sum(ws_ext_discount_amt) as double)  as excess_discount_amount
      |from
      |    web_sales
      |   ,item
      |   ,date_dim
      |where
      |i_manufact_id = 269
      |and i_item_sk = ws_item_sk
      |and d_date between '1998-03-18' and
      |        (cast('1998-03-18' as date) + interval '90' day)
      |and d_date_sk = ws_sold_date_sk
      |and cast(ws_ext_discount_amt as double)
      |     > (
      |         SELECT
      |            1.3 * (cast(sum(ws_ext_discount_amt) as double) / nullif(count(ws_ext_discount_amt),0))
      |         FROM
      |            web_sales
      |           ,date_dim
      |         WHERE
      |              ws_item_sk = i_item_sk
      |          and d_date between '1998-03-18' and
      |                             (cast('1998-03-18' as date) + interval '90' day)
      |          and d_date_sk = ws_sold_date_sk
      |      )
      |order by excess_discount_amount
      |limit 100""".stripMargin

  // query94.sql: web orders shipped from multiple warehouses with no
  // return — the web analog of q16.
  private val q94Body =
    """select
      |   cast(count(distinct ws_order_number) as bigint) as order_count
      |  ,cast(sum(ws_ext_ship_cost) as double) as total_shipping_cost
      |  ,cast(sum(ws_net_profit) as double) as total_net_profit
      |from
      |   web_sales ws1
      |  ,date_dim
      |  ,customer_address
      |  ,web_site
      |where
      |    d_date between '1999-5-01' and
      |           (cast('1999-5-01' as date) + interval '60' day)
      |and ws1.ws_ship_date_sk = d_date_sk
      |and ws1.ws_ship_addr_sk = ca_address_sk
      |and ca_state = 'TX'
      |and ws1.ws_web_site_sk = web_site_sk
      |and web_company_name = 'pri'
      |and exists (select *
      |            from web_sales ws2
      |            where ws1.ws_order_number = ws2.ws_order_number
      |              and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
      |and not exists(select *
      |               from web_returns wr1
      |               where ws1.ws_order_number = wr1.wr_order_number)
      |order by order_count
      |limit 100""".stripMargin

  // query95.sql: like q94 but BOTH-exists (multi-warehouse AND returned),
  // expressed through the reference's ws_wh self-join CTE + IN subqueries.
  private val q95Body =
    """with ws_wh as
      |(select ws1.ws_order_number,ws1.ws_warehouse_sk wh1,ws2.ws_warehouse_sk wh2
      | from web_sales ws1,web_sales ws2
      | where ws1.ws_order_number = ws2.ws_order_number
      |   and ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
      | select
      |   cast(count(distinct ws_order_number) as bigint) as order_count
      |  ,cast(sum(ws_ext_ship_cost) as double) as total_shipping_cost
      |  ,cast(sum(ws_net_profit) as double) as total_net_profit
      |from
      |   web_sales ws1
      |  ,date_dim
      |  ,customer_address
      |  ,web_site
      |where
      |    d_date between '1999-5-01' and
      |           (cast('1999-5-01' as date) + interval '60' day)
      |and ws1.ws_ship_date_sk = d_date_sk
      |and ws1.ws_ship_addr_sk = ca_address_sk
      |and ca_state = 'TX'
      |and ws1.ws_web_site_sk = web_site_sk
      |and web_company_name = 'pri'
      |and ws1.ws_order_number in (select ws_order_number
      |                            from ws_wh)
      |and ws1.ws_order_number in (select wr_order_number
      |                            from web_returns,ws_wh
      |                            where wr_order_number = ws_wh.ws_order_number)
      |order by order_count
      |limit 100""".stripMargin

  // query97.sql (the reference ships the zetasql-adapted text): customer×
  // item overlap between store and catalog channels via full outer join.
  private val q97Body =
    """with ssci as (
      |select ss_customer_sk customer_sk
      |      ,ss_item_sk item_sk
      |from store_sales,date_dim
      |where ss_sold_date_sk = d_date_sk
      |  and d_month_seq between 1212 and 1212 + 11
      |group by ss_customer_sk
      |        ,ss_item_sk),
      |csci as(
      | select cs_bill_customer_sk customer_sk
      |      ,cs_item_sk item_sk
      |from catalog_sales,date_dim
      |where cs_sold_date_sk = d_date_sk
      |  and d_month_seq between 1212 and 1212 + 11
      |group by cs_bill_customer_sk
      |        ,cs_item_sk)
      | select  cast(sum(case when ssci.customer_sk is not null and csci.customer_sk is null then 1 else 0 end) as bigint) store_only
      |      ,cast(sum(case when ssci.customer_sk is null and csci.customer_sk is not null then 1 else 0 end) as bigint) catalog_only
      |      ,cast(sum(case when ssci.customer_sk is not null and csci.customer_sk is not null then 1 else 0 end) as bigint) store_and_catalog
      |from ssci full outer join csci on (ssci.customer_sk=csci.customer_sk
      |                               and ssci.item_sk = csci.item_sk)
      |limit 100""".stripMargin

  // query99.sql: catalog shipping-lag day bands by warehouse/mode/call
  // center. Space-bearing band aliases renamed; counts cast to bigint.
  private val q99Body =
    """select
      |   substring(w_warehouse_name,1,20) wh_name
      |  ,sm_type
      |  ,cc_name
      |  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk <= 30 ) then 1 else 0 end) as bigint)  as days_30
      |  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk > 30) and
      |                 (cs_ship_date_sk - cs_sold_date_sk <= 60) then 1 else 0 end ) as bigint)  as days_31_60
      |  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk > 60) and
      |                 (cs_ship_date_sk - cs_sold_date_sk <= 90) then 1 else 0 end) as bigint)  as days_61_90
      |  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk > 90) and
      |                 (cs_ship_date_sk - cs_sold_date_sk <= 120) then 1 else 0 end) as bigint)  as days_91_120
      |  ,cast(sum(case when (cs_ship_date_sk - cs_sold_date_sk  > 120) then 1 else 0 end) as bigint)  as days_over_120
      |from
      |   catalog_sales
      |  ,warehouse
      |  ,ship_mode
      |  ,call_center
      |  ,date_dim
      |where
      |    d_month_seq between 1212 and 1212 + 11
      |and cs_ship_date_sk   = d_date_sk
      |and cs_warehouse_sk   = w_warehouse_sk
      |and cs_ship_mode_sk   = sm_ship_mode_sk
      |and cs_call_center_sk = cc_call_center_sk
      |group by
      |   substring(w_warehouse_name,1,20)
      |  ,sm_type
      |  ,cc_name
      |order by wh_name
      |        ,sm_type
      |        ,cc_name
      |limit 100""".stripMargin

  // query90.sql: web sales AM/PM ratio for high-dependent-count
  // households on long pages. The decimal(15,4) division goes through
  // double; the reserved `at` alias becomes a_side.
  private val q90Body =
    """select  cast(amc as double)/cast(pmc as double) am_pm_ratio
      | from ( select count(*) amc
      |       from web_sales, household_demographics , time_dim, web_page
      |       where ws_sold_time_sk = time_dim.t_time_sk
      |         and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
      |         and ws_web_page_sk = web_page.wp_web_page_sk
      |         and time_dim.t_hour between 6 and 6+1
      |         and household_demographics.hd_dep_count = 8
      |         and web_page.wp_char_count between 5000 and 5200) a_side,
      |      ( select count(*) pmc
      |       from web_sales, household_demographics , time_dim, web_page
      |       where ws_sold_time_sk = time_dim.t_time_sk
      |         and ws_ship_hdemo_sk = household_demographics.hd_demo_sk
      |         and ws_web_page_sk = web_page.wp_web_page_sk
      |         and time_dim.t_hour between 14 and 14+1
      |         and household_demographics.hd_dep_count = 8
      |         and web_page.wp_char_count between 5000 and 5200) p_side
      | order by am_pm_ratio
      | limit 100""".stripMargin

  // query60.sql: per-item September Children-category sales, all three
  // channels unioned, for central-timezone customers.
  private val q60Body =
    """with ss as (
      | select
      |          i_item_id,sum(ss_ext_sales_price) total_sales
      | from
      | 	store_sales,
      | 	date_dim,
      |         customer_address,
      |         item
      | where
      |         i_item_id in (select
      |  i_item_id
      |from
      | item
      |where i_category in ('Children'))
      | and     ss_item_sk              = i_item_sk
      | and     ss_sold_date_sk         = d_date_sk
      | and     d_year                  = 1999
      | and     d_moy                   = 9
      | and     ss_addr_sk              = ca_address_sk
      | and     ca_gmt_offset           = -6
      | group by i_item_id),
      | cs as (
      | select
      |          i_item_id,sum(cs_ext_sales_price) total_sales
      | from
      | 	catalog_sales,
      | 	date_dim,
      |         customer_address,
      |         item
      | where
      |         i_item_id               in (select
      |  i_item_id
      |from
      | item
      |where i_category in ('Children'))
      | and     cs_item_sk              = i_item_sk
      | and     cs_sold_date_sk         = d_date_sk
      | and     d_year                  = 1999
      | and     d_moy                   = 9
      | and     cs_bill_addr_sk         = ca_address_sk
      | and     ca_gmt_offset           = -6
      | group by i_item_id),
      | ws as (
      | select
      |          i_item_id,sum(ws_ext_sales_price) total_sales
      | from
      | 	web_sales,
      | 	date_dim,
      |         customer_address,
      |         item
      | where
      |         i_item_id               in (select
      |  i_item_id
      |from
      | item
      |where i_category in ('Children'))
      | and     ws_item_sk              = i_item_sk
      | and     ws_sold_date_sk         = d_date_sk
      | and     d_year                  = 1999
      | and     d_moy                   = 9
      | and     ws_bill_addr_sk         = ca_address_sk
      | and     ca_gmt_offset           = -6
      | group by i_item_id)
      |  select
      |  i_item_id
      |,cast(sum(total_sales) as double) total_sales
      | from  (select * from ss
      |        union all
      |        select * from cs
      |        union all
      |        select * from ws) tmp1
      | group by i_item_id
      | order by i_item_id
      |      ,total_sales
      | limit 100""".stripMargin

  // query69.sql: demographics of customers with a store purchase but no
  // web or catalog purchase in the quarter. ca_state list adapted.
  private val q69Body =
    """select
      |  cd_gender,
      |  cd_marital_status,
      |  cd_education_status,
      |  cast(count(*) as bigint) cnt1,
      |  cd_purchase_estimate,
      |  cast(count(*) as bigint) cnt2,
      |  cd_credit_rating,
      |  cast(count(*) as bigint) cnt3
      | from
      |  customer c,customer_address ca,customer_demographics
      | where
      |  c.c_current_addr_sk = ca.ca_address_sk and
      |  ca_state in ('CO','IL','MN') and
      |  cd_demo_sk = c.c_current_cdemo_sk and
      |  exists (select *
      |          from store_sales,date_dim
      |          where c.c_customer_sk = ss_customer_sk and
      |                ss_sold_date_sk = d_date_sk and
      |                d_year = 1999 and
      |                d_moy between 1 and 1+2) and
      |   (not exists (select *
      |            from web_sales,date_dim
      |            where c.c_customer_sk = ws_bill_customer_sk and
      |                  ws_sold_date_sk = d_date_sk and
      |                  d_year = 1999 and
      |                  d_moy between 1 and 1+2) and
      |    not exists (select *
      |            from catalog_sales,date_dim
      |            where c.c_customer_sk = cs_ship_customer_sk and
      |                  cs_sold_date_sk = d_date_sk and
      |                  d_year = 1999 and
      |                  d_moy between 1 and 1+2))
      | group by cd_gender,
      |          cd_marital_status,
      |          cd_education_status,
      |          cd_purchase_estimate,
      |          cd_credit_rating
      | order by cd_gender,
      |          cd_marital_status,
      |          cd_education_status,
      |          cd_purchase_estimate,
      |          cd_credit_rating
      | limit 100""".stripMargin

  // query71.sql: December brand revenue at breakfast/dinner times across
  // all three channels. No LIMIT, so the float-desc ORDER BY is safe
  // (the gate sorts rows canonically before hashing).
  private val q71Body =
    """select i_brand_id brand_id, i_brand brand,t_hour,t_minute,
      | 	cast(sum(ext_price) as double) ext_price
      | from item, (select ws_ext_sales_price as ext_price,
      |                        ws_sold_date_sk as sold_date_sk,
      |                        ws_item_sk as sold_item_sk,
      |                        ws_sold_time_sk as time_sk
      |                 from web_sales,date_dim
      |                 where d_date_sk = ws_sold_date_sk
      |                   and d_moy=12
      |                   and d_year=2000
      |                 union all
      |                 select cs_ext_sales_price as ext_price,
      |                        cs_sold_date_sk as sold_date_sk,
      |                        cs_item_sk as sold_item_sk,
      |                        cs_sold_time_sk as time_sk
      |                 from catalog_sales,date_dim
      |                 where d_date_sk = cs_sold_date_sk
      |                   and d_moy=12
      |                   and d_year=2000
      |                 union all
      |                 select ss_ext_sales_price as ext_price,
      |                        ss_sold_date_sk as sold_date_sk,
      |                        ss_item_sk as sold_item_sk,
      |                        ss_sold_time_sk as time_sk
      |                 from store_sales,date_dim
      |                 where d_date_sk = ss_sold_date_sk
      |                   and d_moy=12
      |                   and d_year=2000
      |                 ) tmp,time_dim
      | where
      |   sold_item_sk = i_item_sk
      |   and i_manager_id=1
      |   and time_sk = t_time_sk
      |   and (t_meal_time = 'breakfast' or t_meal_time = 'dinner')
      | group by i_brand, i_brand_id,t_hour,t_minute
      | order by ext_price desc, i_brand_id""".stripMargin

  // query76.sql: row counts and value of sales whose audit column is
  // NULL, per channel (ss_addr_sk / ws_web_page_sk / cs_warehouse_sk
  // carry ~2% nulls in the generator for exactly this query).
  private val q76Body =
    """select  channel, col_name, d_year, d_qoy, i_category, cast(COUNT(*) as bigint) sales_cnt, cast(SUM(ext_sales_price) as double) sales_amt FROM (
      |        SELECT 'store' as channel, 'ss_addr_sk' col_name, d_year, d_qoy, i_category, ss_ext_sales_price ext_sales_price
      |         FROM store_sales, item, date_dim
      |         WHERE ss_addr_sk IS NULL
      |           AND ss_sold_date_sk=d_date_sk
      |           AND ss_item_sk=i_item_sk
      |        UNION ALL
      |        SELECT 'web' as channel, 'ws_web_page_sk' col_name, d_year, d_qoy, i_category, ws_ext_sales_price ext_sales_price
      |         FROM web_sales, item, date_dim
      |         WHERE ws_web_page_sk IS NULL
      |           AND ws_sold_date_sk=d_date_sk
      |           AND ws_item_sk=i_item_sk
      |        UNION ALL
      |        SELECT 'catalog' as channel, 'cs_warehouse_sk' col_name, d_year, d_qoy, i_category, cs_ext_sales_price ext_sales_price
      |         FROM catalog_sales, item, date_dim
      |         WHERE cs_warehouse_sk IS NULL
      |           AND cs_sold_date_sk=d_date_sk
      |           AND cs_item_sk=i_item_sk) foo
      |GROUP BY channel, col_name, d_year, d_qoy, i_category
      |ORDER BY channel, col_name, d_year, d_qoy, i_category
      |limit 100""".stripMargin

  // query66.sql: the warehouse monthly sales/net pivot over web+catalog,
  // carrier-filtered. The reference text writes 36 near-identical month
  // aggregates per half; they are generated here (the resulting SQL is
  // still one shared body). Carriers adapted to ('DHL','AIRBORNE');
  // `year` → sales_year (reserved-word alias).
  private val months = Seq("jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec")
  private def q66Half(fact: String, pfx: String, salesExpr: String, netCol: String): String = {
    val sales = months.zipWithIndex.map { case (m, i) =>
      s" \t,sum(case when d_moy = ${i + 1} \n \t\tthen $salesExpr else 0 end) as ${m}_sales"
    }.mkString("\n")
    val nets = months.zipWithIndex.map { case (m, i) =>
      s" \t,sum(case when d_moy = ${i + 1} \n \t\tthen $netCol * ${pfx}_quantity else 0 end) as ${m}_net"
    }.mkString("\n")
    s"""    (select
 \tw_warehouse_name
 \t,w_warehouse_sq_ft
 \t,w_city
 \t,w_county
 \t,w_state
 \t,w_country
 \t,'DHL' || ',' || 'AIRBORNE' as ship_carriers
       ,d_year as sales_year
$sales
$nets
     from
          $fact
         ,warehouse
         ,date_dim
         ,time_dim
 \t  ,ship_mode
     where
            ${pfx}_warehouse_sk =  w_warehouse_sk
        and ${pfx}_sold_date_sk = d_date_sk
        and ${pfx}_sold_time_sk = t_time_sk
 \tand ${pfx}_ship_mode_sk = sm_ship_mode_sk
        and d_year = 2002
 \tand t_time between 49530 and 49530+28800
 \tand sm_carrier in ('DHL','AIRBORNE')
     group by
        w_warehouse_name
 \t,w_warehouse_sq_ft
 \t,w_city
 \t,w_county
 \t,w_state
 \t,w_country
       ,d_year
 \t)"""
  }
  private val q66Body = {
    val outerSales = months.map(m => s" \t,cast(sum(${m}_sales) as double) as ${m}_sales").mkString("\n")
    val outerSqft = months.map(m =>
      s" \t,sum(${m}_sales/cast(w_warehouse_sq_ft as double)) as ${m}_sales_per_sq_foot").mkString("\n")
    val outerNet = months.map(m => s" \t,cast(sum(${m}_net) as double) as ${m}_net").mkString("\n")
    s"""select
         w_warehouse_name
 \t,w_warehouse_sq_ft
 \t,w_city
 \t,w_county
 \t,w_state
 \t,w_country
        ,ship_carriers
        ,sales_year
$outerSales
$outerSqft
$outerNet
 from (
${q66Half("web_sales", "ws", "ws_sales_price* ws_quantity", "ws_net_paid_inc_tax")}
 union all
${q66Half("catalog_sales", "cs", "cs_ext_sales_price* cs_quantity", "cs_net_paid_inc_ship_tax")}
 ) x
 group by
        w_warehouse_name
 \t,w_warehouse_sq_ft
 \t,w_city
 \t,w_county
 \t,w_state
 \t,w_country
 \t,ship_carriers
       ,sales_year
 order by w_warehouse_name
 limit 100"""
  }

  // query77.sql: 30-day sales/returns/profit per channel id with a
  // channel×id rollup. `returns` (reserved) → returns_amt; the rollup
  // ORDER BY gets the q67 NULLS FIRST rule.
  private val q77Body =
    """with ss as
      | (select s_store_sk,
      |         sum(ss_ext_sales_price) as sales,
      |         sum(ss_net_profit) as profit
      | from store_sales,
      |      date_dim,
      |      store
      | where ss_sold_date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '30' day)
      |       and ss_store_sk = s_store_sk
      | group by s_store_sk)
      | ,
      | sr as
      | (select s_store_sk,
      |         sum(sr_return_amt) as returns_amt,
      |         sum(sr_net_loss) as profit_loss
      | from store_returns,
      |      date_dim,
      |      store
      | where sr_returned_date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '30' day)
      |       and sr_store_sk = s_store_sk
      | group by s_store_sk),
      | cs as
      | (select cs_call_center_sk,
      |        sum(cs_ext_sales_price) as sales,
      |        sum(cs_net_profit) as profit
      | from catalog_sales,
      |      date_dim
      | where cs_sold_date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '30' day)
      | group by cs_call_center_sk
      | ),
      | cr as
      | (select
      |        sum(cr_return_amount) as returns_amt,
      |        sum(cr_net_loss) as profit_loss
      | from catalog_returns,
      |      date_dim
      | where cr_returned_date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '30' day)
      | ),
      | ws as
      | ( select wp_web_page_sk,
      |        sum(ws_ext_sales_price) as sales,
      |        sum(ws_net_profit) as profit
      | from web_sales,
      |      date_dim,
      |      web_page
      | where ws_sold_date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '30' day)
      |       and ws_web_page_sk = wp_web_page_sk
      | group by wp_web_page_sk),
      | wr as
      | (select wp_web_page_sk,
      |        sum(wr_return_amt) as returns_amt,
      |        sum(wr_net_loss) as profit_loss
      | from web_returns,
      |      date_dim,
      |      web_page
      | where wr_returned_date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '30' day)
      |       and wr_web_page_sk = wp_web_page_sk
      | group by wp_web_page_sk)
      |  select  channel
      |        , id
      |        , cast(sum(sales) as double) as sales
      |        , cast(sum(returns_amt) as double) as returns_amt
      |        , cast(sum(profit) as double) as profit
      | from
      | (select 'store channel' as channel
      |        , ss.s_store_sk as id
      |        , sales
      |        , coalesce(returns_amt, 0) as returns_amt
      |        , (profit - coalesce(profit_loss,0)) as profit
      | from   ss left join sr
      |        on  ss.s_store_sk = sr.s_store_sk
      | union all
      | select 'catalog channel' as channel
      |        , cs_call_center_sk as id
      |        , sales
      |        , returns_amt
      |        , (profit - profit_loss) as profit
      | from  cs
      |       , cr
      | union all
      | select 'web channel' as channel
      |        , ws.wp_web_page_sk as id
      |        , sales
      |        , coalesce(returns_amt, 0) returns_amt
      |        , (profit - coalesce(profit_loss,0)) as profit
      | from   ws left join wr
      |        on  ws.wp_web_page_sk = wr.wp_web_page_sk
      | ) x
      | group by rollup (channel, id)
      | order by channel nulls first
      |         ,id nulls first
      | limit 100""".stripMargin

  // query78.sql: store sales with no return, per customer-item-year,
  // against the same customer-item's other-channel volume. Quantity sums
  // cast to bigint; money sums to double at output.
  private val q78Body =
    """with ws as
      |  (select d_year AS ws_sold_year, ws_item_sk,
      |    ws_bill_customer_sk ws_customer_sk,
      |    cast(sum(ws_quantity) as bigint) ws_qty,
      |    sum(ws_wholesale_cost) ws_wc,
      |    sum(ws_sales_price) ws_sp
      |   from web_sales
      |   left join web_returns on wr_order_number=ws_order_number and ws_item_sk=wr_item_sk
      |   join date_dim on ws_sold_date_sk = d_date_sk
      |   where wr_order_number is null
      |   group by d_year, ws_item_sk, ws_bill_customer_sk
      |   ),
      |cs as
      |  (select d_year AS cs_sold_year, cs_item_sk,
      |    cs_bill_customer_sk cs_customer_sk,
      |    cast(sum(cs_quantity) as bigint) cs_qty,
      |    sum(cs_wholesale_cost) cs_wc,
      |    sum(cs_sales_price) cs_sp
      |   from catalog_sales
      |   left join catalog_returns on cr_order_number=cs_order_number and cs_item_sk=cr_item_sk
      |   join date_dim on cs_sold_date_sk = d_date_sk
      |   where cr_order_number is null
      |   group by d_year, cs_item_sk, cs_bill_customer_sk
      |   ),
      |ss as
      |  (select d_year AS ss_sold_year, ss_item_sk,
      |    ss_customer_sk,
      |    cast(sum(ss_quantity) as bigint) ss_qty,
      |    sum(ss_wholesale_cost) ss_wc,
      |    sum(ss_sales_price) ss_sp
      |   from store_sales
      |   left join store_returns on sr_ticket_number=ss_ticket_number and ss_item_sk=sr_item_sk
      |   join date_dim on ss_sold_date_sk = d_date_sk
      |   where sr_ticket_number is null
      |   group by d_year, ss_item_sk, ss_customer_sk
      |   )
      | select
      |ss_sold_year, ss_item_sk, ss_customer_sk,
      |round(ss_qty/(coalesce(ws_qty,0)+coalesce(cs_qty,0)),2) ratio,
      |ss_qty store_qty, cast(ss_wc as double) store_wholesale_cost, cast(ss_sp as double) store_sales_price,
      |coalesce(ws_qty,0)+coalesce(cs_qty,0) other_chan_qty,
      |cast(coalesce(ws_wc,0)+coalesce(cs_wc,0) as double) other_chan_wholesale_cost,
      |cast(coalesce(ws_sp,0)+coalesce(cs_sp,0) as double) other_chan_sales_price
      |from ss
      |left join ws on (ws_sold_year=ss_sold_year and ws_item_sk=ss_item_sk and ws_customer_sk=ss_customer_sk)
      |left join cs on (cs_sold_year=ss_sold_year and cs_item_sk=ss_item_sk and cs_customer_sk=ss_customer_sk)
      |where (coalesce(ws_qty,0)>0 or coalesce(cs_qty, 0)>0) and ss_sold_year=2000
      |order by
      |  ss_sold_year, ss_item_sk, ss_customer_sk,
      |  ss_qty desc, ss_wc desc, ss_sp desc,
      |  other_chan_qty,
      |  other_chan_wholesale_cost,
      |  other_chan_sales_price,
      |  ratio
      |limit 100""".stripMargin

  // query83.sql: per-item return quantities across the three return
  // channels for three specific weeks, with channel share percentages.
  private val q83Body =
    """with sr_items as
      | (select i_item_id item_id,
      |        cast(sum(sr_return_quantity) as bigint) sr_item_qty
      | from store_returns,
      |      item,
      |      date_dim
      | where sr_item_sk = i_item_sk
      | and   d_date    in
      |	(select d_date
      |	from date_dim
      |	where d_week_seq in
      |		(select d_week_seq
      |		from date_dim
      |	  where d_date in ('1998-01-02','1998-10-15','1998-11-10')))
      | and   sr_returned_date_sk   = d_date_sk
      | group by i_item_id),
      | cr_items as
      | (select i_item_id item_id,
      |        cast(sum(cr_return_quantity) as bigint) cr_item_qty
      | from catalog_returns,
      |      item,
      |      date_dim
      | where cr_item_sk = i_item_sk
      | and   d_date    in
      |	(select d_date
      |	from date_dim
      |	where d_week_seq in
      |		(select d_week_seq
      |		from date_dim
      |	  where d_date in ('1998-01-02','1998-10-15','1998-11-10')))
      | and   cr_returned_date_sk   = d_date_sk
      | group by i_item_id),
      | wr_items as
      | (select i_item_id item_id,
      |        cast(sum(wr_return_quantity) as bigint) wr_item_qty
      | from web_returns,
      |      item,
      |      date_dim
      | where wr_item_sk = i_item_sk
      | and   d_date    in
      |	(select d_date
      |	from date_dim
      |	where d_week_seq in
      |		(select d_week_seq
      |		from date_dim
      |		where d_date in ('1998-01-02','1998-10-15','1998-11-10')))
      | and   wr_returned_date_sk   = d_date_sk
      | group by i_item_id)
      |  select  sr_items.item_id
      |       ,sr_item_qty
      |       ,cast(sr_item_qty/(sr_item_qty+cr_item_qty+wr_item_qty)/cast(3.0 as double) * 100 as double) sr_dev
      |       ,cr_item_qty
      |       ,cast(cr_item_qty/(sr_item_qty+cr_item_qty+wr_item_qty)/cast(3.0 as double) * 100 as double) cr_dev
      |       ,wr_item_qty
      |       ,cast(wr_item_qty/(sr_item_qty+cr_item_qty+wr_item_qty)/cast(3.0 as double) * 100 as double) wr_dev
      |       ,cast((sr_item_qty+cr_item_qty+wr_item_qty)/cast(3.0 as double) as double) average
      | from sr_items
      |     ,cr_items
      |     ,wr_items
      | where sr_items.item_id=cr_items.item_id
      |   and sr_items.item_id=wr_items.item_id
      | order by sr_items.item_id
      |         ,sr_item_qty
      | limit 100""".stripMargin

  // query12.sql / query20.sql: 30-day item revenue and in-class revenue
  // share for the web / catalog channels (q98 is the store analog). The
  // share division goes through double on both engines.
  private def q12Style(fact: String, pfx: String, custCol: String): String =
    s"""select  i_item_desc
      |      ,i_category
      |      ,i_class
      |      ,cast(i_current_price as double) as i_current_price
      |      ,i_item_id
      |      ,cast(sum(${pfx}_ext_sales_price) as double) as itemrevenue
      |      ,cast(sum(${pfx}_ext_sales_price) as double)*100/cast(sum(sum(${pfx}_ext_sales_price)) over
      |          (partition by i_class) as double) as revenueratio
      |from
      |	$fact
      |    	,item
      |    	,date_dim
      |where
      |	${pfx}_item_sk = i_item_sk
      |  	and i_category in ('Jewelry', 'Sports', 'Books')
      |  	and ${pfx}_sold_date_sk = d_date_sk
      |	and d_date between cast('2001-01-12' as date)
      |				and (cast('2001-01-12' as date) + interval '30' day)
      |group by
      |	i_item_id
      |        ,i_item_desc
      |        ,i_category
      |        ,i_class
      |        ,i_current_price
      |order by
      |	i_category
      |        ,i_class
      |        ,i_item_id
      |        ,i_item_desc
      |        ,revenueratio
      |limit 100""".stripMargin
  private val q12Body = q12Style("web_sales", "ws", "ws_bill_customer_sk")
  private val q20Body = q12Style("catalog_sales", "cs", "cs_bill_customer_sk")

  // query15.sql: catalog sales by zip for qualifying zips/states/prices.
  private val q15Body =
    """select  ca_zip
      |       ,cast(sum(cs_sales_price) as double) sum_sales
      | from catalog_sales
      |     ,customer
      |     ,customer_address
      |     ,date_dim
      | where cs_bill_customer_sk = c_customer_sk
      | 	and c_current_addr_sk = ca_address_sk
      | 	and ( substring(ca_zip,1,5) in ('85669', '86197','88274','83405','86475',
      |                                   '85392', '85460', '80348', '81792')
      | 	      or ca_state in ('CA','WA','GA')
      | 	      or cs_sales_price > 500)
      | 	and cs_sold_date_sk = d_date_sk
      | 	and d_qoy = 2 and d_year = 2000
      | group by ca_zip
      | order by ca_zip
      | limit 100""".stripMargin

  // query32.sql: the catalog analog of q92's excess-discount correlated
  // subquery, with the same exact-sum/double-division rewrite.
  private val q32Body =
    """select  cast(sum(cs_ext_discount_amt) as double)  as excess_discount_amount
      |from
      |   catalog_sales
      |   ,item
      |   ,date_dim
      |where
      |i_manufact_id = 269
      |and i_item_sk = cs_item_sk
      |and d_date between '1998-03-18' and
      |        (cast('1998-03-18' as date) + interval '90' day)
      |and d_date_sk = cs_sold_date_sk
      |and cast(cs_ext_discount_amt as double)
      |     > (
      |         select
      |            1.3 * (cast(sum(cs_ext_discount_amt) as double) / nullif(count(cs_ext_discount_amt),0))
      |         from
      |            catalog_sales
      |           ,date_dim
      |         where
      |              cs_item_sk = i_item_sk
      |          and d_date between '1998-03-18' and
      |                             (cast('1998-03-18' as date) + interval '90' day)
      |          and d_date_sk = cs_sold_date_sk
      |      )
      |limit 100""".stripMargin

  // query33.sql / query56.sql: three-channel monthly totals by
  // manufacturer (Books) / by item (given colors) for one timezone.
  private def q33Style(keyCol: String, innerFilter: String, year: Int, moy: Int,
      gmt: Int, tail: String): String = {
    def half(fact: String, pfx: String, addr: String) =
      s"""select $keyCol,sum(${pfx}_ext_sales_price) total_sales
         | from
         | \t$fact,
         | \tdate_dim,
         |         customer_address,
         |         item
         | where $keyCol in (select
         |     $keyCol
         |from item
         |where $innerFilter)
         | and     ${pfx}_item_sk              = i_item_sk
         | and     ${pfx}_sold_date_sk         = d_date_sk
         | and     d_year                  = $year
         | and     d_moy                   = $moy
         | and     $addr              = ca_address_sk
         | and     ca_gmt_offset           = $gmt
         | group by $keyCol""".stripMargin
    s"""with ss as (
       | ${half("store_sales", "ss", "ss_addr_sk")}),
       | cs as (
       | ${half("catalog_sales", "cs", "cs_bill_addr_sk")}),
       | ws as (
       | ${half("web_sales", "ws", "ws_bill_addr_sk")})
       |  select  $keyCol ,cast(sum(total_sales) as double) total_sales
       | from  (select * from ss
       |        union all
       |        select * from cs
       |        union all
       |        select * from ws) tmp1
       | group by $keyCol
       | $tail
       |limit 100""".stripMargin
  }
  // q33's bare ORDER BY total_sales gains the key as tiebreak (the q79
  // rule: LIMIT under a non-total order is undefined)
  private val q33Body = q33Style("i_manufact_id", "i_category in ('Books')",
    1999, 3, -5, "order by total_sales, i_manufact_id")
  private val q56Body = q33Style("i_item_id",
    "i_color in ('orchid','chiffon','lace')", 2000, 1, -8,
    "order by total_sales,\n          i_item_id")

  // query38.sql / query87.sql: customers active in ALL three channels
  // (intersect) / in store but neither other channel (except).
  private def q38Style(op: String): String =
    s"""select cast(count(*) as bigint) num_cust from (
      |    (select distinct c_last_name, c_first_name, d_date
      |    from store_sales, date_dim, customer
      |          where store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |      and store_sales.ss_customer_sk = customer.c_customer_sk
      |      and d_month_seq between 1212 and 1212 + 11)
      |  $op
      |    (select distinct c_last_name, c_first_name, d_date
      |    from catalog_sales, date_dim, customer
      |          where catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
      |      and catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
      |      and d_month_seq between 1212 and 1212 + 11)
      |  $op
      |    (select distinct c_last_name, c_first_name, d_date
      |    from web_sales, date_dim, customer
      |          where web_sales.ws_sold_date_sk = date_dim.d_date_sk
      |      and web_sales.ws_bill_customer_sk = customer.c_customer_sk
      |      and d_month_seq between 1212 and 1212 + 11)
      |) hot_cust
      |limit 100""".stripMargin
  private val q38Body = q38Style("intersect")
  private val q87Body = q38Style("except")

  // query62.sql: the web analog of q99's shipping-lag day bands.
  private val q62Body =
    """select
      |   substring(w_warehouse_name,1,20) wh_name
      |  ,sm_type
      |  ,web_name
      |  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk <= 30 ) then 1 else 0 end) as bigint)  as days_30
      |  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk > 30) and
      |                 (ws_ship_date_sk - ws_sold_date_sk <= 60) then 1 else 0 end ) as bigint)  as days_31_60
      |  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk > 60) and
      |                 (ws_ship_date_sk - ws_sold_date_sk <= 90) then 1 else 0 end) as bigint)  as days_61_90
      |  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk > 90) and
      |                 (ws_ship_date_sk - ws_sold_date_sk <= 120) then 1 else 0 end) as bigint)  as days_91_120
      |  ,cast(sum(case when (ws_ship_date_sk - ws_sold_date_sk  > 120) then 1 else 0 end) as bigint)  as days_over_120
      |from
      |   web_sales
      |  ,warehouse
      |  ,ship_mode
      |  ,web_site
      |  ,date_dim
      |where
      |    d_month_seq between 1212 and 1212 + 11
      |and ws_ship_date_sk   = d_date_sk
      |and ws_warehouse_sk   = w_warehouse_sk
      |and ws_ship_mode_sk   = sm_ship_mode_sk
      |and ws_web_site_sk    = web_site_sk
      |group by
      |   substring(w_warehouse_name,1,20)
      |  ,sm_type
      |  ,web_name
      |order by wh_name
      |        ,sm_type
      |       ,web_name
      |limit 100""".stripMargin

  // query4.sql: customers whose catalog growth beats BOTH store and web
  // growth. year_total's /2 and the growth ratios go through double (the
  // engines' decimal-division scale rules differ); the CTE is otherwise
  // the reference's three-channel union.
  private def q4YearTotal(fact: String, pfx: String, cust: String, tag: String,
      expr: String): String =
    s""" select c_customer_id customer_id
       |       ,c_first_name customer_first_name
       |       ,c_last_name customer_last_name
       |       ,c_preferred_cust_flag customer_preferred_cust_flag
       |       ,c_birth_country customer_birth_country
       |       ,c_login customer_login
       |       ,c_email_address customer_email_address
       |       ,d_year dyear
       |       ,cast(sum($expr) as double)/2 year_total
       |       ,'$tag' sale_type
       | from customer
       |     ,$fact
       |     ,date_dim
       | where c_customer_sk = $cust
       |   and ${pfx}_sold_date_sk = d_date_sk
       | group by c_customer_id
       |         ,c_first_name
       |         ,c_last_name
       |         ,c_preferred_cust_flag
       |         ,c_birth_country
       |         ,c_login
       |         ,c_email_address
       |         ,d_year""".stripMargin
  private val q4Body =
    s"""with year_total as (
       |${q4YearTotal("store_sales", "ss", "ss_customer_sk", "s",
           "(ss_ext_list_price-ss_ext_wholesale_cost-ss_ext_discount_amt)+ss_ext_sales_price")}
       | union all
       |${q4YearTotal("catalog_sales", "cs", "cs_bill_customer_sk", "c",
           "(cs_ext_list_price-cs_ext_wholesale_cost-cs_ext_discount_amt)+cs_ext_sales_price")}
       | union all
       |${q4YearTotal("web_sales", "ws", "ws_bill_customer_sk", "w",
           "(ws_ext_list_price-ws_ext_wholesale_cost-ws_ext_discount_amt)+ws_ext_sales_price")}
       |         )
       |  select
       |                  t_s_secyear.customer_id
       |                 ,t_s_secyear.customer_first_name
       |                 ,t_s_secyear.customer_last_name
       |                 ,t_s_secyear.customer_preferred_cust_flag
       | from year_total t_s_firstyear
       |     ,year_total t_s_secyear
       |     ,year_total t_c_firstyear
       |     ,year_total t_c_secyear
       |     ,year_total t_w_firstyear
       |     ,year_total t_w_secyear
       | where t_s_secyear.customer_id = t_s_firstyear.customer_id
       |   and t_s_firstyear.customer_id = t_c_secyear.customer_id
       |   and t_s_firstyear.customer_id = t_c_firstyear.customer_id
       |   and t_s_firstyear.customer_id = t_w_firstyear.customer_id
       |   and t_s_firstyear.customer_id = t_w_secyear.customer_id
       |   and t_s_firstyear.sale_type = 's'
       |   and t_c_firstyear.sale_type = 'c'
       |   and t_w_firstyear.sale_type = 'w'
       |   and t_s_secyear.sale_type = 's'
       |   and t_c_secyear.sale_type = 'c'
       |   and t_w_secyear.sale_type = 'w'
       |   and t_s_firstyear.dyear =  2001
       |   and t_s_secyear.dyear = 2001+1
       |   and t_c_firstyear.dyear =  2001
       |   and t_c_secyear.dyear =  2001+1
       |   and t_w_firstyear.dyear = 2001
       |   and t_w_secyear.dyear = 2001+1
       |   and t_s_firstyear.year_total > 0
       |   and t_c_firstyear.year_total > 0
       |   and t_w_firstyear.year_total > 0
       |   and case when t_c_firstyear.year_total > 0 then t_c_secyear.year_total / t_c_firstyear.year_total else null end
       |           > case when t_s_firstyear.year_total > 0 then t_s_secyear.year_total / t_s_firstyear.year_total else null end
       |   and case when t_c_firstyear.year_total > 0 then t_c_secyear.year_total / t_c_firstyear.year_total else null end
       |           > case when t_w_firstyear.year_total > 0 then t_w_secyear.year_total / t_w_firstyear.year_total else null end
       | order by t_s_secyear.customer_id
       |         ,t_s_secyear.customer_first_name
       |         ,t_s_secyear.customer_last_name
       |         ,t_s_secyear.customer_preferred_cust_flag
       |limit 100""".stripMargin

  // query74.sql: the two-channel max-net-paid variant of q4/q11. The
  // reserved `year` alias becomes yr; ratios through double (max of a
  // decimal is exact, so only the division needs the rule).
  private def q74YearTotal(fact: String, pfx: String, cust: String, tag: String): String =
    s""" select c_customer_id customer_id
       |       ,c_first_name customer_first_name
       |       ,c_last_name customer_last_name
       |       ,d_year as yr
       |       ,max(${pfx}_net_paid) year_total
       |       ,'$tag' sale_type
       | from customer
       |     ,$fact
       |     ,date_dim
       | where c_customer_sk = $cust
       |   and ${pfx}_sold_date_sk = d_date_sk
       |   and d_year in (2001,2001+1)
       | group by c_customer_id
       |         ,c_first_name
       |         ,c_last_name
       |         ,d_year""".stripMargin
  private val q74Body =
    s"""with year_total as (
       |${q74YearTotal("store_sales", "ss", "ss_customer_sk", "s")}
       | union all
       |${q74YearTotal("web_sales", "ws", "ws_bill_customer_sk", "w")}
       |         )
       |  select
       |        t_s_secyear.customer_id, t_s_secyear.customer_first_name, t_s_secyear.customer_last_name
       | from year_total t_s_firstyear
       |     ,year_total t_s_secyear
       |     ,year_total t_w_firstyear
       |     ,year_total t_w_secyear
       | where t_s_secyear.customer_id = t_s_firstyear.customer_id
       |         and t_s_firstyear.customer_id = t_w_secyear.customer_id
       |         and t_s_firstyear.customer_id = t_w_firstyear.customer_id
       |         and t_s_firstyear.sale_type = 's'
       |         and t_w_firstyear.sale_type = 'w'
       |         and t_s_secyear.sale_type = 's'
       |         and t_w_secyear.sale_type = 'w'
       |         and t_s_firstyear.yr = 2001
       |         and t_s_secyear.yr = 2001+1
       |         and t_w_firstyear.yr = 2001
       |         and t_w_secyear.yr = 2001+1
       |         and t_s_firstyear.year_total > 0
       |         and t_w_firstyear.year_total > 0
       |         and case when t_w_firstyear.year_total > 0 then cast(t_w_secyear.year_total as double) / cast(t_w_firstyear.year_total as double) else null end
       |           > case when t_s_firstyear.year_total > 0 then cast(t_s_secyear.year_total as double) / cast(t_s_firstyear.year_total as double) else null end
       | order by 2,1,3
       |limit 100""".stripMargin

  // query17.sql: buy-return-rebuy quantity statistics per item/state.
  // stddev and cov round to 4 decimals (the q37 stat-agg rule: the
  // engines' one-pass moment accumulations differ in final ulps).
  private val q17Body =
    """select  i_item_id
      |       ,i_item_desc
      |       ,s_state
      |       ,cast(count(ss_quantity) as bigint) as store_sales_quantitycount
      |       ,avg(ss_quantity) as store_sales_quantityave
      |       ,round(stddev_samp(ss_quantity), 4) as store_sales_quantitystdev
      |       ,round(stddev_samp(ss_quantity)/avg(ss_quantity), 4) as store_sales_quantitycov
      |       ,cast(count(sr_return_quantity) as bigint) as store_returns_quantitycount
      |       ,avg(sr_return_quantity) as store_returns_quantityave
      |       ,round(stddev_samp(sr_return_quantity), 4) as store_returns_quantitystdev
      |       ,round(stddev_samp(sr_return_quantity)/avg(sr_return_quantity), 4) as store_returns_quantitycov
      |       ,cast(count(cs_quantity) as bigint) as catalog_sales_quantitycount ,avg(cs_quantity) as catalog_sales_quantityave
      |       ,round(stddev_samp(cs_quantity), 4) as catalog_sales_quantitystdev
      |       ,round(stddev_samp(cs_quantity)/avg(cs_quantity), 4) as catalog_sales_quantitycov
      | from store_sales
      |     ,store_returns
      |     ,catalog_sales
      |     ,date_dim d1
      |     ,date_dim d2
      |     ,date_dim d3
      |     ,store
      |     ,item
      | where d1.d_quarter_name = '1998Q1'
      |   and d1.d_date_sk = ss_sold_date_sk
      |   and i_item_sk = ss_item_sk
      |   and s_store_sk = ss_store_sk
      |   and ss_customer_sk = sr_customer_sk
      |   and ss_item_sk = sr_item_sk
      |   and ss_ticket_number = sr_ticket_number
      |   and sr_returned_date_sk = d2.d_date_sk
      |   and d2.d_quarter_name in ('1998Q1','1998Q2','1998Q3')
      |   and sr_customer_sk = cs_bill_customer_sk
      |   and sr_item_sk = cs_item_sk
      |   and cs_sold_date_sk = d3.d_date_sk
      |   and d3.d_quarter_name in ('1998Q1','1998Q2','1998Q3')
      | group by i_item_id
      |         ,i_item_desc
      |         ,s_state
      | order by i_item_id
      | limit 100""".stripMargin

  // query26.sql: catalog demographics/promotion averages (q7's catalog
  // analog); decimal averages via exact-sum/double-division.
  private val q26Body =
    """select  i_item_id,
      |        avg(cs_quantity) agg1,
      |        cast(sum(cs_list_price) as double)/count(cs_list_price) agg2,
      |        cast(sum(cs_coupon_amt) as double)/count(cs_coupon_amt) agg3,
      |        cast(sum(cs_sales_price) as double)/count(cs_sales_price) agg4
      | from catalog_sales, customer_demographics, date_dim, item, promotion
      | where cs_sold_date_sk = d_date_sk and
      |       cs_item_sk = i_item_sk and
      |       cs_bill_cdemo_sk = cd_demo_sk and
      |       cs_promo_sk = p_promo_sk and
      |       cd_gender = 'F' and
      |       cd_marital_status = 'W' and
      |       cd_education_status = 'Primary' and
      |       (p_channel_email = 'N' or p_channel_event = 'N') and
      |       d_year = 1998
      | group by i_item_id
      | order by i_item_id
      | limit 100""".stripMargin

  // query34.sql: month-edge bulk shoppers from high-buy-potential
  // multi-vehicle households. The 15-20 items/ticket band is adapted to
  // 2-5 (the q73 rule: generated tickets carry ~3 lines).
  private val q34Body =
    """select c_last_name
      |       ,c_first_name
      |       ,c_salutation
      |       ,c_preferred_cust_flag
      |       ,ss_ticket_number
      |       ,cnt from
      |   (select ss_ticket_number
      |          ,ss_customer_sk
      |          ,cast(count(*) as bigint) cnt
      |    from store_sales,date_dim,store,household_demographics
      |    where store_sales.ss_sold_date_sk = date_dim.d_date_sk
      |    and store_sales.ss_store_sk = store.s_store_sk
      |    and store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
      |    and (date_dim.d_dom between 1 and 3 or date_dim.d_dom between 25 and 28)
      |    and (household_demographics.hd_buy_potential = '>10000' or
      |         household_demographics.hd_buy_potential = 'Unknown')
      |    and household_demographics.hd_vehicle_count > 0
      |    and (case when household_demographics.hd_vehicle_count > 0
      |	then household_demographics.hd_dep_count/ household_demographics.hd_vehicle_count
      |	else null
      |	end)  > 1.2
      |    and date_dim.d_year in (1998,1998+1,1998+2)
      |    and store.s_county in ('Williamson County','Williamson County','Williamson County','Williamson County',
      |                           'Williamson County','Williamson County','Williamson County','Williamson County')
      |    group by ss_ticket_number,ss_customer_sk) dn,customer
      |    where ss_customer_sk = c_customer_sk
      |      and cnt between 2 and 5
      |    order by c_last_name,c_first_name,c_salutation,c_preferred_cust_flag desc, ss_ticket_number""".stripMargin

  // query35.sql: dependent-count statistics for customers active in the
  // store channel and at least one other channel. The unnamed avg/max/sum
  // outputs gain aliases; integer sums cast to bigint.
  private val q35Body =
    """select
      |  ca_state,
      |  cd_gender,
      |  cd_marital_status,
      |  cd_dep_count,
      |  cast(count(*) as bigint) cnt1,
      |  avg(cd_dep_count) avg_dep,
      |  max(cd_dep_count) max_dep,
      |  cast(sum(cd_dep_count) as bigint) sum_dep,
      |  cd_dep_employed_count,
      |  cast(count(*) as bigint) cnt2,
      |  avg(cd_dep_employed_count) avg_emp,
      |  max(cd_dep_employed_count) max_emp,
      |  cast(sum(cd_dep_employed_count) as bigint) sum_emp,
      |  cd_dep_college_count,
      |  cast(count(*) as bigint) cnt3,
      |  avg(cd_dep_college_count) avg_col,
      |  max(cd_dep_college_count) max_col,
      |  cast(sum(cd_dep_college_count) as bigint) sum_col
      | from
      |  customer c,customer_address ca,customer_demographics
      | where
      |  c.c_current_addr_sk = ca.ca_address_sk and
      |  cd_demo_sk = c.c_current_cdemo_sk and
      |  exists (select *
      |          from store_sales,date_dim
      |          where c.c_customer_sk = ss_customer_sk and
      |                ss_sold_date_sk = d_date_sk and
      |                d_year = 1999 and
      |                d_qoy < 4) and
      |   (exists (select *
      |            from web_sales,date_dim
      |            where c.c_customer_sk = ws_bill_customer_sk and
      |                  ws_sold_date_sk = d_date_sk and
      |                  d_year = 1999 and
      |                  d_qoy < 4) or
      |    exists (select *
      |            from catalog_sales,date_dim
      |            where c.c_customer_sk = cs_ship_customer_sk and
      |                  cs_sold_date_sk = d_date_sk and
      |                  d_year = 1999 and
      |                  d_qoy < 4))
      | group by ca_state,
      |          cd_gender,
      |          cd_marital_status,
      |          cd_dep_count,
      |          cd_dep_employed_count,
      |          cd_dep_college_count
      | order by ca_state,
      |          cd_gender,
      |          cd_marital_status,
      |          cd_dep_count,
      |          cd_dep_employed_count,
      |          cd_dep_college_count
      | limit 100""".stripMargin

  // query86.sql: web net-paid over the category/class rollup with
  // rank-within-parent (q70's web analog).
  private val q86Body =
    """select
      |    cast(sum(ws_net_paid) as double) as total_sum
      |   ,i_category
      |   ,i_class
      |   ,grouping(i_category)+grouping(i_class) as lochierarchy
      |   ,rank() over (
      | 	partition by grouping(i_category)+grouping(i_class),
      | 	case when grouping(i_class) = 0 then i_category end
      | 	order by sum(ws_net_paid) desc) as rank_within_parent
      | from
      |    web_sales
      |   ,date_dim       d1
      |   ,item
      | where
      |    d1.d_month_seq between 1212 and 1212+11
      | and d1.d_date_sk = ws_sold_date_sk
      | and i_item_sk  = ws_item_sk
      | group by rollup(i_category,i_class)
      | order by
      |   lochierarchy desc,
      |   case when lochierarchy = 0 then i_category end,
      |   rank_within_parent
      | limit 100""".stripMargin

  // query18.sql: catalog demographics rollup averages. The reference's
  // avg(cast(x as decimal(12,2))) goes through exact-sum/double-division
  // (Spark returns exact decimal averages, DuckDB floating ones); the
  // rollup ORDER BY gains NULLS FIRST (q67 rule).
  private val q18Body = {
    def avgOf(x: String, n: Int) =
      s"cast(sum(cast($x as decimal(12,2))) as double)/count($x) agg$n"
    s"""select  i_item_id,
      |        ca_country,
      |        ca_state,
      |        ca_county,
      |        ${avgOf("cs_quantity", 1)},
      |        ${avgOf("cs_list_price", 2)},
      |        ${avgOf("cs_coupon_amt", 3)},
      |        ${avgOf("cs_sales_price", 4)},
      |        ${avgOf("cs_net_profit", 5)},
      |        ${avgOf("c_birth_year", 6)},
      |        ${avgOf("cd1.cd_dep_count", 7)}
      | from catalog_sales, customer_demographics cd1,
      |      customer_demographics cd2, customer, customer_address, date_dim, item
      | where cs_sold_date_sk = d_date_sk and
      |       cs_item_sk = i_item_sk and
      |       cs_bill_cdemo_sk = cd1.cd_demo_sk and
      |       cs_bill_customer_sk = c_customer_sk and
      |       cd1.cd_gender = 'M' and
      |       cd1.cd_education_status = 'College' and
      |       c_current_cdemo_sk = cd2.cd_demo_sk and
      |       c_current_addr_sk = ca_address_sk and
      |       c_birth_month in (9,5,12,4,1,10) and
      |       d_year = 2001 and
      |       ca_state in ('ND','WI','AL'
      |                   ,'NC','OK','MS','TN')
      | group by rollup (i_item_id, ca_country, ca_state, ca_county)
      | order by ca_country nulls first,
      |        ca_state nulls first,
      |        ca_county nulls first,
      |	i_item_id nulls first
      | limit 100""".stripMargin
  }

  // query49.sql: worst return ratios per channel, rank-unioned. The
  // return-amount floor is adapted to the generator's domain (>100; the
  // reference's 10000 exceeds every generated return), and the
  // decimal(15,4) ratio divisions go through double.
  private def q49Channel(tag: String, fact: String, ret: String, pfx: String,
      rpfx: String, saleKey: String, retKey: String,
      retAmt: String = "return_amt"): String =
    s""" select
      | '$tag' as channel
      | ,$tag.item
      | ,$tag.return_ratio
      | ,$tag.return_rank
      | ,$tag.currency_rank
      | from (
      | 	select
      | 	 item
      | 	,return_ratio
      | 	,currency_ratio
      | 	,rank() over (order by return_ratio) as return_rank
      | 	,rank() over (order by currency_ratio) as currency_rank
      | 	from
      | 	(	select ${pfx}.${pfx}_item_sk as item
      | 		,(cast(sum(coalesce(${rpfx}.${rpfx}_return_quantity,0)) as double)/
      | 		cast(sum(coalesce(${pfx}.${pfx}_quantity,0)) as double)) as return_ratio
      | 		,(cast(sum(coalesce(${rpfx}.${rpfx}_$retAmt,0)) as double)/
      | 		cast(sum(coalesce(${pfx}.${pfx}_net_paid,0)) as double)) as currency_ratio
      | 		from
      | 		 $fact ${pfx} left outer join $ret ${rpfx}
      | 			on (${pfx}.$saleKey = ${rpfx}.$retKey and
      | 			${pfx}.${pfx}_item_sk = ${rpfx}.${rpfx}_item_sk)
      |                 ,date_dim
      | 		where
      | 			${rpfx}.${rpfx}_$retAmt > 100
      | 			and ${pfx}.${pfx}_net_profit > 1
      |                         and ${pfx}.${pfx}_net_paid > 0
      |                         and ${pfx}.${pfx}_quantity > 0
      |                         and ${pfx}_sold_date_sk = d_date_sk
      |                         and d_year = 2000
      |                         and d_moy = 12
      | 		group by ${pfx}.${pfx}_item_sk
      | 	) in_$tag
      | ) $tag
      | where
      | (
      | $tag.return_rank <= 10
      | or
      | $tag.currency_rank <= 10
      | )""".stripMargin
  private val q49Body = {
    // the reference aliases catalog_returns as cr but refers to columns
    // via the cr_ prefix; our generic template passes matching prefixes
    s"""select  channel, item, return_ratio, return_rank, currency_rank from
      | (${q49Channel("web", "web_sales", "web_returns", "ws", "wr",
          "ws_order_number", "wr_order_number")}
      | union
      |${q49Channel("catalog", "catalog_sales", "catalog_returns", "cs", "cr",
          "cs_order_number", "cr_order_number", retAmt = "return_amount")}
      | union
      |${q49Channel("store", "store_sales", "store_returns", "ss", "sr",
          "ss_ticket_number", "sr_ticket_number")}
      | )
      | order by 1,4,5,2
      | limit 100""".stripMargin
  }

  // query51.sql: cumulative web-vs-store revenue crossover via windowed
  // running sums over the channel full-outer join. The decimal running
  // sums are compared in decimal (exact) and cast to double at output.
  private val q51Body =
    """WITH web_v1 as (
      |select
      |  ws_item_sk item_sk, d_date,
      |  sum(sum(ws_sales_price))
      |      over (partition by ws_item_sk order by d_date rows between unbounded preceding and current row) cume_sales
      |from web_sales
      |    ,date_dim
      |where ws_sold_date_sk=d_date_sk
      |  and d_month_seq between 1212 and 1212+11
      |  and ws_item_sk is not NULL
      |group by ws_item_sk, d_date),
      |store_v1 as (
      |select
      |  ss_item_sk item_sk, d_date,
      |  sum(sum(ss_sales_price))
      |      over (partition by ss_item_sk order by d_date rows between unbounded preceding and current row) cume_sales
      |from store_sales
      |    ,date_dim
      |where ss_sold_date_sk=d_date_sk
      |  and d_month_seq between 1212 and 1212+11
      |  and ss_item_sk is not NULL
      |group by ss_item_sk, d_date)
      | select  item_sk, d_date,
      |     cast(web_sales as double) web_sales,
      |     cast(store_sales as double) store_sales,
      |     cast(web_cumulative as double) web_cumulative,
      |     cast(store_cumulative as double) store_cumulative
      |from (select item_sk
      |     ,d_date
      |     ,web_sales
      |     ,store_sales
      |     ,max(web_sales)
      |         over (partition by item_sk order by d_date rows between unbounded preceding and current row) web_cumulative
      |     ,max(store_sales)
      |         over (partition by item_sk order by d_date rows between unbounded preceding and current row) store_cumulative
      |     from (select case when web.item_sk is not null then web.item_sk else store.item_sk end item_sk
      |                 ,case when web.d_date is not null then web.d_date else store.d_date end d_date
      |                 ,web.cume_sales web_sales
      |                 ,store.cume_sales store_sales
      |           from web_v1 web full outer join store_v1 store on (web.item_sk = store.item_sk
      |                                                          and web.d_date = store.d_date)
      |          )x )y
      |where web_cumulative > store_cumulative
      |order by item_sk
      |        ,d_date
      |limit 100""".stripMargin

  // query91.sql: call-center catalog-return losses for given
  // demographics. hd_buy_potential's '0-500%' pattern is adapted to the
  // generator's '501-1000' bucket.
  private val q91Body =
    """select
      |        cc_call_center_id Call_Center,
      |        cc_name Call_Center_Name,
      |        cc_manager Manager,
      |        cast(sum(cr_net_loss) as double) Returns_Loss
      |from
      |        call_center,
      |        catalog_returns,
      |        date_dim,
      |        customer,
      |        customer_address,
      |        customer_demographics,
      |        household_demographics
      |where
      |        cr_call_center_sk       = cc_call_center_sk
      |and     cr_returned_date_sk     = d_date_sk
      |and     cr_returning_customer_sk= c_customer_sk
      |and     cd_demo_sk              = c_current_cdemo_sk
      |and     hd_demo_sk              = c_current_hdemo_sk
      |and     ca_address_sk           = c_current_addr_sk
      |and     d_year                  = 1999
      |and     d_moy                   = 11
      |and     ( (cd_marital_status       = 'M' and cd_education_status     = 'Unknown')
      |        or(cd_marital_status       = 'W' and cd_education_status     = 'Advanced Degree'))
      |and     hd_buy_potential like '501-1000%'
      |and     ca_gmt_offset           = -7
      |group by cc_call_center_id,cc_name,cc_manager,cd_marital_status,cd_education_status
      |order by sum(cr_net_loss) desc""".stripMargin

  // query30.sql / query81.sql: customers whose web / catalog returns
  // exceed 1.2x their state's average. The correlated average goes
  // through exact-sum/double-division (the q92 rule).
  private val q30Body =
    """with customer_total_return as
      | (select wr_returning_customer_sk as ctr_customer_sk
      |        ,ca_state as ctr_state,
      | 	sum(wr_return_amt) as ctr_total_return
      | from web_returns
      |     ,date_dim
      |     ,customer_address
      | where wr_returned_date_sk = d_date_sk
      |   and d_year =2002
      |   and wr_returning_addr_sk = ca_address_sk
      | group by wr_returning_customer_sk
      |         ,ca_state)
      |  select  c_customer_id,c_salutation,c_first_name,c_last_name,c_preferred_cust_flag
      |       ,c_birth_day,c_birth_month,c_birth_year,c_birth_country,c_login,c_email_address
      |       ,c_last_review_date_sk,cast(ctr_total_return as double) ctr_total_return
      | from customer_total_return ctr1
      |     ,customer_address
      |     ,customer
      | where cast(ctr1.ctr_total_return as double) > (select (cast(sum(ctr_total_return) as double)/count(ctr_total_return))*1.2
      | 			  from customer_total_return ctr2
      |                  	  where ctr1.ctr_state = ctr2.ctr_state)
      |       and ca_address_sk = c_current_addr_sk
      |       and ca_state = 'IL'
      |       and ctr1.ctr_customer_sk = c_customer_sk
      | order by c_customer_id,c_salutation,c_first_name,c_last_name,c_preferred_cust_flag
      |                  ,c_birth_day,c_birth_month,c_birth_year,c_birth_country,c_login,c_email_address
      |                  ,c_last_review_date_sk,ctr_total_return
      |limit 100""".stripMargin

  private val q81Body =
    """with customer_total_return as
      | (select cr_returning_customer_sk as ctr_customer_sk
      |        ,ca_state as ctr_state,
      | 	sum(cr_return_amt_inc_tax) as ctr_total_return
      | from catalog_returns
      |     ,date_dim
      |     ,customer_address
      | where cr_returned_date_sk = d_date_sk
      |   and d_year =1998
      |   and cr_returning_addr_sk = ca_address_sk
      | group by cr_returning_customer_sk
      |         ,ca_state )
      |  select  c_customer_id,c_salutation,c_first_name,c_last_name,ca_street_number,ca_street_name
      |                   ,ca_street_type,ca_suite_number,ca_city,ca_county,ca_state,ca_zip,ca_country,ca_gmt_offset
      |                  ,ca_location_type,cast(ctr_total_return as double) ctr_total_return
      | from customer_total_return ctr1
      |     ,customer_address
      |     ,customer
      | where cast(ctr1.ctr_total_return as double) > (select (cast(sum(ctr_total_return) as double)/count(ctr_total_return))*1.2
      | 			  from customer_total_return ctr2
      |                  	  where ctr1.ctr_state = ctr2.ctr_state)
      |       and ca_address_sk = c_current_addr_sk
      |       and ca_state = 'IL'
      |       and ctr1.ctr_customer_sk = c_customer_sk
      | order by c_customer_id,c_salutation,c_first_name,c_last_name,ca_street_number,ca_street_name
      |                   ,ca_street_type,ca_suite_number,ca_city,ca_county,ca_state,ca_zip,ca_country,ca_gmt_offset
      |                  ,ca_location_type,ctr_total_return
      | limit 100""".stripMargin

  // query31.sql: county quarter-over-quarter growth, web vs store; the
  // growth-ratio comparisons and outputs go through double.
  private val q31Body =
    """with ss as
      | (select ca_county,d_qoy, d_year,sum(ss_ext_sales_price) as store_sales
      | from store_sales,date_dim,customer_address
      | where ss_sold_date_sk = d_date_sk
      |  and ss_addr_sk=ca_address_sk
      | group by ca_county,d_qoy, d_year),
      | ws as
      | (select ca_county,d_qoy, d_year,sum(ws_ext_sales_price) as web_sales
      | from web_sales,date_dim,customer_address
      | where ws_sold_date_sk = d_date_sk
      |  and ws_bill_addr_sk=ca_address_sk
      | group by ca_county,d_qoy, d_year)
      | select
      |        ss1.ca_county
      |       ,ss1.d_year
      |       ,cast(ws2.web_sales as double)/cast(ws1.web_sales as double) web_q1_q2_increase
      |       ,cast(ss2.store_sales as double)/cast(ss1.store_sales as double) store_q1_q2_increase
      |       ,cast(ws3.web_sales as double)/cast(ws2.web_sales as double) web_q2_q3_increase
      |       ,cast(ss3.store_sales as double)/cast(ss2.store_sales as double) store_q2_q3_increase
      | from
      |        ss ss1
      |       ,ss ss2
      |       ,ss ss3
      |       ,ws ws1
      |       ,ws ws2
      |       ,ws ws3
      | where
      |    ss1.d_qoy = 1
      |    and ss1.d_year = 2000
      |    and ss1.ca_county = ss2.ca_county
      |    and ss2.d_qoy = 2
      |    and ss2.d_year = 2000
      | and ss2.ca_county = ss3.ca_county
      |    and ss3.d_qoy = 3
      |    and ss3.d_year = 2000
      |    and ss1.ca_county = ws1.ca_county
      |    and ws1.d_qoy = 1
      |    and ws1.d_year = 2000
      |    and ws1.ca_county = ws2.ca_county
      |    and ws2.d_qoy = 2
      |    and ws2.d_year = 2000
      |    and ws1.ca_county = ws3.ca_county
      |    and ws3.d_qoy = 3
      |    and ws3.d_year =2000
      |    and case when ws1.web_sales > 0 then cast(ws2.web_sales as double)/cast(ws1.web_sales as double) else null end
      |       > case when ss1.store_sales > 0 then cast(ss2.store_sales as double)/cast(ss1.store_sales as double) else null end
      |    and case when ws2.web_sales > 0 then cast(ws3.web_sales as double)/cast(ws2.web_sales as double) else null end
      |       > case when ss2.store_sales > 0 then cast(ss3.store_sales as double)/cast(ss2.store_sales as double) else null end
      | order by ss1.d_year""".stripMargin

  // query58.sql: items with the same revenue (within 10%) in all three
  // channels for one week; channel shares through double division (q83
  // rule). The 0.9x/1.1x band comparisons stay in exact decimal.
  private val q58Body = {
    def items(cte: String, fact: String, pfx: String, rev: String) =
      s"""$cte as
         | (select i_item_id item_id
         |        ,sum(${pfx}_ext_sales_price) $rev
         | from $fact
         |     ,item
         |     ,date_dim
         | where ${pfx}_item_sk = i_item_sk
         |   and d_date in (select d_date
         |                  from date_dim
         |                  where d_week_seq = (select d_week_seq
         |                                      from date_dim
         |                                      where d_date = '1998-02-19'))
         |   and ${pfx}_sold_date_sk   = d_date_sk
         | group by i_item_id)""".stripMargin
    s"""with ${items("ss_items", "store_sales", "ss", "ss_item_rev")},
       | ${items("cs_items", "catalog_sales", "cs", "cs_item_rev")},
       | ${items("ws_items", "web_sales", "ws", "ws_item_rev")}
       |  select  ss_items.item_id
       |       ,cast(ss_item_rev as double) ss_item_rev
       |       ,round(cast(ss_item_rev as double)/cast(ss_item_rev+cs_item_rev+ws_item_rev as double)/3 * 100, 4) ss_dev
       |       ,cast(cs_item_rev as double) cs_item_rev
       |       ,round(cast(cs_item_rev as double)/cast(ss_item_rev+cs_item_rev+ws_item_rev as double)/3 * 100, 4) cs_dev
       |       ,cast(ws_item_rev as double) ws_item_rev
       |       ,round(cast(ws_item_rev as double)/cast(ss_item_rev+cs_item_rev+ws_item_rev as double)/3 * 100, 4) ws_dev
       |       ,round(cast(ss_item_rev+cs_item_rev+ws_item_rev as double)/3, 4) average
       | from ss_items,cs_items,ws_items
       | where ss_items.item_id=cs_items.item_id
       |   and ss_items.item_id=ws_items.item_id
       |   and ss_item_rev between 0.9 * cs_item_rev and 1.1 * cs_item_rev
       |   and ss_item_rev between 0.9 * ws_item_rev and 1.1 * ws_item_rev
       |   and cs_item_rev between 0.9 * ss_item_rev and 1.1 * ss_item_rev
       |   and cs_item_rev between 0.9 * ws_item_rev and 1.1 * ws_item_rev
       |   and ws_item_rev between 0.9 * ss_item_rev and 1.1 * ss_item_rev
       |   and ws_item_rev between 0.9 * cs_item_rev and 1.1 * cs_item_rev
       | order by ss_items.item_id
       |         ,ss_item_rev
       | limit 100""".stripMargin
  }

  // query72.sql: catalog orders that outstripped same-week inventory,
  // promo vs no-promo. The reference's trailing ORDER BY d_week_seq is
  // ambiguous across the three date_dim aliases; qualified to d1 (the
  // grouping column) on both engines.
  private val q72Body =
    """select  i_item_desc
      |      ,w_warehouse_name
      |      ,d1.d_week_seq
      |      ,cast(count(case when p_promo_sk is null then 1 else 0 end) as bigint) no_promo
      |      ,cast(count(case when p_promo_sk is not null then 1 else 0 end) as bigint) promo
      |      ,cast(count(*) as bigint) total_cnt
      |from catalog_sales
      |join inventory on (cs_item_sk = inv_item_sk)
      |join warehouse on (w_warehouse_sk=inv_warehouse_sk)
      |join item on (i_item_sk = cs_item_sk)
      |join customer_demographics on (cs_bill_cdemo_sk = cd_demo_sk)
      |join household_demographics on (cs_bill_hdemo_sk = hd_demo_sk)
      |join date_dim d1 on (cs_sold_date_sk = d1.d_date_sk)
      |join date_dim d2 on (inv_date_sk = d2.d_date_sk)
      |join date_dim d3 on (cs_ship_date_sk = d3.d_date_sk)
      |left outer join promotion on (cs_promo_sk=p_promo_sk)
      |left outer join catalog_returns on (cr_item_sk = cs_item_sk and cr_order_number = cs_order_number)
      |where d1.d_week_seq = d2.d_week_seq
      |  and inv_quantity_on_hand < cs_quantity
      |  and d3.d_date > d1.d_date + interval '5' day
      |  and hd_buy_potential = '1001-5000'
      |  and d1.d_year = 2001
      |  and hd_buy_potential = '1001-5000'
      |  and cd_marital_status = 'M'
      |  and d1.d_year = 2001
      |group by i_item_desc,w_warehouse_name,d1.d_week_seq
      |order by total_cnt desc, i_item_desc, w_warehouse_name, d1.d_week_seq
      |limit 100""".stripMargin

  // query10.sql: demographics counts for county customers active in
  // store AND (web OR catalog) in one quarter — q69's inclusive sibling.
  private val q10Body =
    """select
      |  cd_gender,
      |  cd_marital_status,
      |  cd_education_status,
      |  cast(count(*) as bigint) cnt1,
      |  cd_purchase_estimate,
      |  cast(count(*) as bigint) cnt2,
      |  cd_credit_rating,
      |  cast(count(*) as bigint) cnt3,
      |  cd_dep_count,
      |  cast(count(*) as bigint) cnt4,
      |  cd_dep_employed_count,
      |  cast(count(*) as bigint) cnt5,
      |  cd_dep_college_count,
      |  cast(count(*) as bigint) cnt6
      | from
      |  customer c,customer_address ca,customer_demographics
      | where
      |  c.c_current_addr_sk = ca.ca_address_sk and
      |  ca_county in ('Walker County','Richland County','Gaines County','Douglas County','Dona Ana County') and
      |  cd_demo_sk = c.c_current_cdemo_sk and
      |  exists (select *
      |          from store_sales,date_dim
      |          where c.c_customer_sk = ss_customer_sk and
      |                ss_sold_date_sk = d_date_sk and
      |                d_year = 2002 and
      |                d_moy between 4 and 4+3) and
      |   (exists (select *
      |            from web_sales,date_dim
      |            where c.c_customer_sk = ws_bill_customer_sk and
      |                  ws_sold_date_sk = d_date_sk and
      |                  d_year = 2002 and
      |                  d_moy between 4 ANd 4+3) or
      |    exists (select *
      |            from catalog_sales,date_dim
      |            where c.c_customer_sk = cs_ship_customer_sk and
      |                  cs_sold_date_sk = d_date_sk and
      |                  d_year = 2002 and
      |                  d_moy between 4 and 4+3))
      | group by cd_gender,
      |          cd_marital_status,
      |          cd_education_status,
      |          cd_purchase_estimate,
      |          cd_credit_rating,
      |          cd_dep_count,
      |          cd_dep_employed_count,
      |          cd_dep_college_count
      | order by cd_gender,
      |          cd_marital_status,
      |          cd_education_status,
      |          cd_purchase_estimate,
      |          cd_credit_rating,
      |          cd_dep_count,
      |          cd_dep_employed_count,
      |          cd_dep_college_count
      |limit 100""".stripMargin

  // query57.sql: call-center monthly deviations — q47's catalog twin,
  // with the same exact-arithmetic rewrites (wtot/wcnt in place of the
  // windowed AVG, 10*abs(...) > wtot for the 10% deviation filter).
  private val q57Body =
    """with v1 as(
      | select i_category, i_brand,
      |        cc_name,
      |        d_year, d_moy,
      |        sum(cs_sales_price) ssum,
      |        sum(sum(cs_sales_price)) over
      |          (partition by i_category, i_brand,
      |                     cc_name, d_year) wtot,
      |        count(*) over
      |          (partition by i_category, i_brand,
      |                     cc_name, d_year) wcnt,
      |        rank() over
      |          (partition by i_category, i_brand,
      |                     cc_name
      |           order by d_year, d_moy) rn
      | from item, catalog_sales, date_dim, call_center
      | where cs_item_sk = i_item_sk and
      |       cs_sold_date_sk = d_date_sk and
      |       cc_call_center_sk= cs_call_center_sk and
      |       (
      |         d_year = 2000 or
      |         ( d_year = 2000-1 and d_moy =12) or
      |         ( d_year = 2000+1 and d_moy =1)
      |       )
      | group by i_category, i_brand,
      |          cc_name , d_year, d_moy),
      | v2 as(
      | select v1.cc_name
      |        ,v1.d_year, v1.d_moy
      |        ,v1.wtot, v1.wcnt
      |        ,v1.ssum, v1_lag.ssum psum, v1_lead.ssum nsum
      | from v1, v1 v1_lag, v1 v1_lead
      | where v1.i_category = v1_lag.i_category and
      |       v1.i_category = v1_lead.i_category and
      |       v1.i_brand = v1_lag.i_brand and
      |       v1.i_brand = v1_lead.i_brand and
      |       v1. cc_name = v1_lag. cc_name and
      |       v1. cc_name = v1_lead. cc_name and
      |       v1.rn = v1_lag.rn + 1 and
      |       v1.rn = v1_lead.rn - 1)
      |select cc_name, d_year, d_moy
      |       ,cast(wtot as double) / wcnt as avg_monthly_sales
      |       ,cast(ssum as double) as sum_sales
      |       ,cast(psum as double) as psum
      |       ,cast(nsum as double) as nsum
      |from v2
      |where d_year = 2000 and
      |      wtot > 0 and
      |      10 * abs(wcnt * ssum - wtot) > wtot
      |order by cast(ssum as double) - cast(wtot as double) / wcnt, nsum,
      |         cc_name, d_moy
      |limit 100""".stripMargin

  // query75.sql: net-of-returns Sports volume, year over year across all
  // three channels. The <0.9 decimal-ratio filter is rewritten exactly
  // over integers (10*curr < 9*prev, the q65 rule); the ORDER BY gains
  // the id columns as tiebreaks under LIMIT (q79 rule).
  private def q75Channel(fact: String, ret: String, pfx: String, rpfx: String,
      saleKey: String, retKey: String, retAmt: String): String =
    s"""       select d_year
       |             ,i_brand_id
       |             ,i_class_id
       |             ,i_category_id
       |             ,i_manufact_id
       |             ,${pfx}_quantity - coalesce(${rpfx}_return_quantity,0) as sales_cnt
       |             ,${pfx}_ext_sales_price - coalesce(${rpfx}_$retAmt,0.0) as sales_amt
       |       from $fact join item on i_item_sk=${pfx}_item_sk
       |                          join date_dim on d_date_sk=${pfx}_sold_date_sk
       |                          left join $ret on ($saleKey=$retKey
       |                                                    and ${pfx}_item_sk=${rpfx}_item_sk)
       |       where i_category='Sports'""".stripMargin
  private val q75Body =
    s"""with all_sales as (
       | select d_year
       |       ,i_brand_id
       |       ,i_class_id
       |       ,i_category_id
       |       ,i_manufact_id
       |       ,cast(sum(sales_cnt) as bigint) as sales_cnt
       |       ,sum(sales_amt) as sales_amt
       | from (${q75Channel("catalog_sales", "catalog_returns", "cs", "cr",
           "cs_order_number", "cr_order_number", "return_amount")}
       |       union
       |${q75Channel("store_sales", "store_returns", "ss", "sr",
           "ss_ticket_number", "sr_ticket_number", "return_amt")}
       |       union
       |${q75Channel("web_sales", "web_returns", "ws", "wr",
           "ws_order_number", "wr_order_number", "return_amt")}) sales_detail
       | group by d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)
       | select  prev_yr.d_year as prev_year
       |                          ,curr_yr.d_year as curr_year
       |                          ,curr_yr.i_brand_id
       |                          ,curr_yr.i_class_id
       |                          ,curr_yr.i_category_id
       |                          ,curr_yr.i_manufact_id
       |                          ,prev_yr.sales_cnt AS prev_yr_cnt
       |                          ,curr_yr.sales_cnt AS curr_yr_cnt
       |                          ,curr_yr.sales_cnt-prev_yr.sales_cnt AS sales_cnt_diff
       |                          ,cast(curr_yr.sales_amt-prev_yr.sales_amt as double) AS sales_amt_diff
       | FROM all_sales curr_yr, all_sales prev_yr
       | where curr_yr.i_brand_id=prev_yr.i_brand_id
       |   and curr_yr.i_class_id=prev_yr.i_class_id
       |   and curr_yr.i_category_id=prev_yr.i_category_id
       |   and curr_yr.i_manufact_id=prev_yr.i_manufact_id
       |   and curr_yr.d_year=2002
       |   and prev_yr.d_year=2002-1
       |   and curr_yr.sales_cnt * 10 < prev_yr.sales_cnt * 9
       | order by sales_cnt_diff, curr_yr.i_brand_id, curr_yr.i_class_id,
       |          curr_yr.i_manufact_id
       | limit 100""".stripMargin

  // ---- round-4 additions: the 13 remaining reference query files.
  // Same house adaptations as the rest of the corpus (decimal sums cast
  // to double at the output edge, counts cast to bigint for DuckDB's
  // HUGEINT, `returns` renamed returns_amt — backtick quoting is not
  // portable — rollup ORDER BY gets explicit NULLS FIRST, decimal AVG
  // goes through exact-sum/double-division per the q9 rule, and
  // duplicate output column names from self-joins get distinct aliases).

  // query5.sql: 14-day sales/returns/profit rollup per channel. The
  // store/catalog sides union facts with returns; the web side left-joins
  // returns back to sales for the site key.
  private val q5Body =
    """with ssr as
      | (select s_store_id,
      |        sum(sales_price) as sales,
      |        sum(profit) as profit,
      |        sum(return_amt) as returns_amt,
      |        sum(net_loss) as profit_loss
      | from
      |  ( select  ss_store_sk as store_sk,
      |            ss_sold_date_sk  as date_sk,
      |            ss_ext_sales_price as sales_price,
      |            ss_net_profit as profit,
      |            cast(0 as decimal(7,2)) as return_amt,
      |            cast(0 as decimal(7,2)) as net_loss
      |    from store_sales
      |    union all
      |    select sr_store_sk as store_sk,
      |           sr_returned_date_sk as date_sk,
      |           cast(0 as decimal(7,2)) as sales_price,
      |           cast(0 as decimal(7,2)) as profit,
      |           sr_return_amt as return_amt,
      |           sr_net_loss as net_loss
      |    from store_returns
      |   ) salesreturns,
      |     date_dim,
      |     store
      | where date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '14' day)
      |       and store_sk = s_store_sk
      | group by s_store_id)
      | ,
      | csr as
      | (select cp_catalog_page_id,
      |        sum(sales_price) as sales,
      |        sum(profit) as profit,
      |        sum(return_amt) as returns_amt,
      |        sum(net_loss) as profit_loss
      | from
      |  ( select  cs_catalog_page_sk as page_sk,
      |            cs_sold_date_sk  as date_sk,
      |            cs_ext_sales_price as sales_price,
      |            cs_net_profit as profit,
      |            cast(0 as decimal(7,2)) as return_amt,
      |            cast(0 as decimal(7,2)) as net_loss
      |    from catalog_sales
      |    union all
      |    select cr_catalog_page_sk as page_sk,
      |           cr_returned_date_sk as date_sk,
      |           cast(0 as decimal(7,2)) as sales_price,
      |           cast(0 as decimal(7,2)) as profit,
      |           cr_return_amount as return_amt,
      |           cr_net_loss as net_loss
      |    from catalog_returns
      |   ) salesreturns,
      |     date_dim,
      |     catalog_page
      | where date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '14' day)
      |       and page_sk = cp_catalog_page_sk
      | group by cp_catalog_page_id)
      | ,
      | wsr as
      | (select web_site_id,
      |        sum(sales_price) as sales,
      |        sum(profit) as profit,
      |        sum(return_amt) as returns_amt,
      |        sum(net_loss) as profit_loss
      | from
      |  ( select  ws_web_site_sk as wsr_web_site_sk,
      |            ws_sold_date_sk  as date_sk,
      |            ws_ext_sales_price as sales_price,
      |            ws_net_profit as profit,
      |            cast(0 as decimal(7,2)) as return_amt,
      |            cast(0 as decimal(7,2)) as net_loss
      |    from web_sales
      |    union all
      |    select ws_web_site_sk as wsr_web_site_sk,
      |           wr_returned_date_sk as date_sk,
      |           cast(0 as decimal(7,2)) as sales_price,
      |           cast(0 as decimal(7,2)) as profit,
      |           wr_return_amt as return_amt,
      |           wr_net_loss as net_loss
      |    from web_returns left outer join web_sales on
      |         ( wr_item_sk = ws_item_sk
      |           and wr_order_number = ws_order_number)
      |   ) salesreturns,
      |     date_dim,
      |     web_site
      | where date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '14' day)
      |       and wsr_web_site_sk = web_site_sk
      | group by web_site_id)
      |  select  channel
      |        , id
      |        , cast(sum(sales) as double) as sales
      |        , cast(sum(returns_amt) as double) as returns_amt
      |        , cast(sum(profit) as double) as profit
      | from
      | (select 'store channel' as channel
      |        , 'store' || s_store_id as id
      |        , sales
      |        , returns_amt
      |        , (profit - profit_loss) as profit
      | from   ssr
      | union all
      | select 'catalog channel' as channel
      |        , 'catalog_page' || cp_catalog_page_id as id
      |        , sales
      |        , returns_amt
      |        , (profit - profit_loss) as profit
      | from  csr
      | union all
      | select 'web channel' as channel
      |        , 'web_site' || web_site_id as id
      |        , sales
      |        , returns_amt
      |        , (profit - profit_loss) as profit
      | from   wsr
      | ) x
      | group by rollup (channel, id)
      | order by channel nulls first
      |         ,id nulls first
      | limit 100""".stripMargin

  // query14a.sql / query14b.sql: cross-channel items (brand/class/category
  // triples sold in ALL three channels, via INTERSECT) vs the all-channel
  // average. avg(decimal) goes through exact-sum/double-division (q9 rule).
  private val q14CrossItems =
    """cross_items as
      | (select i_item_sk ss_item_sk
      | from item,
      |    (select iss.i_brand_id brand_id, iss.i_class_id class_id, iss.i_category_id category_id
      |     from store_sales, item iss, date_dim d1
      |     where ss_item_sk = iss.i_item_sk
      |                    and ss_sold_date_sk = d1.d_date_sk
      |       and d1.d_year between 1999 AND 1999 + 2
      |   intersect
      |     select ics.i_brand_id, ics.i_class_id, ics.i_category_id
      |     from catalog_sales, item ics, date_dim d2
      |     where cs_item_sk = ics.i_item_sk
      |       and cs_sold_date_sk = d2.d_date_sk
      |       and d2.d_year between 1999 AND 1999 + 2
      |   intersect
      |     select iws.i_brand_id, iws.i_class_id, iws.i_category_id
      |     from web_sales, item iws, date_dim d3
      |     where ws_item_sk = iws.i_item_sk
      |       and ws_sold_date_sk = d3.d_date_sk
      |       and d3.d_year between 1999 AND 1999 + 2) x
      | where i_brand_id = brand_id
      |   and i_class_id = class_id
      |   and i_category_id = category_id
      |)""".stripMargin

  private def q14AvgSales(fromYear: Int) =
    s"""avg_sales as
      | (select cast(sum(quantity*list_price) as double)/count(*) average_sales
      |  from (
      |     select ss_quantity quantity, ss_list_price list_price
      |     from store_sales, date_dim
      |     where ss_sold_date_sk = d_date_sk
      |       and d_year between $fromYear and $fromYear + 2
      |   union all
      |     select cs_quantity quantity, cs_list_price list_price
      |     from catalog_sales, date_dim
      |     where cs_sold_date_sk = d_date_sk
      |       and d_year between $fromYear and $fromYear + 2
      |   union all
      |     select ws_quantity quantity, ws_list_price list_price
      |     from web_sales, date_dim
      |     where ws_sold_date_sk = d_date_sk
      |       and d_year between $fromYear and $fromYear + 2) x)""".stripMargin

  private val q14aBody =
    s"""with $q14CrossItems,
      | ${q14AvgSales(1999)}
      | select channel, i_brand_id,i_class_id,i_category_id,cast(sum(sales) as double) sales, cast(sum(number_sales) as bigint) number_sales
      | from(
      |     select 'store' channel, i_brand_id,i_class_id
      |             ,i_category_id,sum(ss_quantity*ss_list_price) sales
      |             , count(*) number_sales
      |     from store_sales, item, date_dim
      |     where ss_item_sk in (select ss_item_sk from cross_items)
      |       and ss_item_sk = i_item_sk
      |       and ss_sold_date_sk = d_date_sk
      |       and d_year = 1999+2
      |       and d_moy = 11
      |     group by i_brand_id,i_class_id,i_category_id
      |     having sum(ss_quantity*ss_list_price) > (select average_sales from avg_sales)
      |   union all
      |     select 'catalog' channel, i_brand_id,i_class_id,i_category_id, sum(cs_quantity*cs_list_price) sales, count(*) number_sales
      |     from catalog_sales, item, date_dim
      |     where cs_item_sk in (select ss_item_sk from cross_items)
      |       and cs_item_sk = i_item_sk
      |       and cs_sold_date_sk = d_date_sk
      |       and d_year = 1999+2
      |       and d_moy = 11
      |     group by i_brand_id,i_class_id,i_category_id
      |     having sum(cs_quantity*cs_list_price) > (select average_sales from avg_sales)
      |   union all
      |     select 'web' channel, i_brand_id,i_class_id,i_category_id, sum(ws_quantity*ws_list_price) sales , count(*) number_sales
      |     from web_sales, item, date_dim
      |     where ws_item_sk in (select ss_item_sk from cross_items)
      |       and ws_item_sk = i_item_sk
      |       and ws_sold_date_sk = d_date_sk
      |       and d_year = 1999+2
      |       and d_moy = 11
      |     group by i_brand_id,i_class_id,i_category_id
      |     having sum(ws_quantity*ws_list_price) > (select average_sales from avg_sales)
      | ) y
      | group by rollup (channel, i_brand_id,i_class_id,i_category_id)
      | order by channel nulls first,i_brand_id nulls first,i_class_id nulls first,i_category_id nulls first
      | limit 100""".stripMargin

  private val q14bBody =
    s"""with $q14CrossItems,
      | ${q14AvgSales(1998)}
      |  select this_year.channel ty_channel
      |         ,this_year.i_brand_id ty_brand
      |         ,this_year.i_class_id ty_class
      |         ,this_year.i_category_id ty_category
      |         ,cast(this_year.sales as double) ty_sales
      |         ,cast(this_year.number_sales as bigint) ty_number_sales
      |         ,last_year.channel ly_channel
      |         ,last_year.i_brand_id ly_brand
      |         ,last_year.i_class_id ly_class
      |         ,last_year.i_category_id ly_category
      |         ,cast(last_year.sales as double) ly_sales
      |         ,cast(last_year.number_sales as bigint) ly_number_sales
      |  from
      | (select 'store' channel, i_brand_id,i_class_id,i_category_id
      |        ,sum(ss_quantity*ss_list_price) sales, count(*) number_sales
      | from store_sales
      |     ,item
      |     ,date_dim
      | where ss_item_sk in (select ss_item_sk from cross_items)
      |   and ss_item_sk = i_item_sk
      |   and ss_sold_date_sk = d_date_sk
      |   and d_week_seq = (select d_week_seq
      |                     from date_dim
      |                     where d_year = 1998 + 1
      |                       and d_moy = 12
      |                       and d_dom = 16)
      | group by i_brand_id,i_class_id,i_category_id
      | having sum(ss_quantity*ss_list_price) > (select average_sales from avg_sales)) this_year,
      | (select 'store' channel, i_brand_id,i_class_id
      |        ,i_category_id, sum(ss_quantity*ss_list_price) sales, count(*) number_sales
      | from store_sales
      |     ,item
      |     ,date_dim
      | where ss_item_sk in (select ss_item_sk from cross_items)
      |   and ss_item_sk = i_item_sk
      |   and ss_sold_date_sk = d_date_sk
      |   and d_week_seq = (select d_week_seq
      |                     from date_dim
      |                     where d_year = 1998
      |                       and d_moy = 12
      |                       and d_dom = 16)
      | group by i_brand_id,i_class_id,i_category_id
      | having sum(ss_quantity*ss_list_price) > (select average_sales from avg_sales)) last_year
      | where this_year.i_brand_id= last_year.i_brand_id
      |   and this_year.i_class_id = last_year.i_class_id
      |   and this_year.i_category_id = last_year.i_category_id
      | order by this_year.channel, this_year.i_brand_id, this_year.i_class_id, this_year.i_category_id
      | limit 100""".stripMargin

  // query23a.sql / query23b.sql: catalog+web January sales restricted to
  // frequently-sold store items and the best store customers (>95% of the
  // max per-customer store spend).
  private val q23Ctes =
    """frequent_ss_items as
      | (select substring(i_item_desc,1,30) itemdesc,i_item_sk item_sk,d_date solddate,count(*) cnt
      |  from store_sales
      |      ,date_dim
      |      ,item
      |  where ss_sold_date_sk = d_date_sk
      |    and ss_item_sk = i_item_sk
      |    and d_year in (1999,1999+1,1999+2,1999+3)
      |  group by substring(i_item_desc,1,30),i_item_sk,d_date
      |  having count(*) >4),
      | max_store_sales as
      | (select max(csales) tpcds_cmax
      |  from (select c_customer_sk,sum(ss_quantity*ss_sales_price) csales
      |        from store_sales
      |            ,customer
      |            ,date_dim
      |        where ss_customer_sk = c_customer_sk
      |         and ss_sold_date_sk = d_date_sk
      |         and d_year in (1999,1999+1,1999+2,1999+3)
      |        group by c_customer_sk) x),
      | best_ss_customer as
      | (select c_customer_sk,sum(ss_quantity*ss_sales_price) ssales
      |  from store_sales
      |      ,customer
      |  where ss_customer_sk = c_customer_sk
      |  group by c_customer_sk
      |  having sum(ss_quantity*ss_sales_price) > (95/100.0) * (select
      |  *
      |from
      | max_store_sales))""".stripMargin

  private val q23aBody =
    s"""with $q23Ctes
      |  select  cast(sum(sales) as double) total_sales
      | from ((select cs_quantity*cs_list_price sales
      |       from catalog_sales
      |           ,date_dim
      |       where d_year = 1999
      |         and d_moy = 1
      |         and cs_sold_date_sk = d_date_sk
      |         and cs_item_sk in (select item_sk from frequent_ss_items)
      |         and cs_bill_customer_sk in (select c_customer_sk from best_ss_customer))
      |      union all
      |      (select ws_quantity*ws_list_price sales
      |       from web_sales
      |           ,date_dim
      |       where d_year = 1999
      |         and d_moy = 1
      |         and ws_sold_date_sk = d_date_sk
      |         and ws_item_sk in (select item_sk from frequent_ss_items)
      |         and ws_bill_customer_sk in (select c_customer_sk from best_ss_customer))) y
      | limit 100""".stripMargin

  private val q23bBody =
    s"""with $q23Ctes
      |  select  c_last_name,c_first_name,sales
      | from ((select c_last_name,c_first_name,cast(sum(cs_quantity*cs_list_price) as double) sales
      |        from catalog_sales
      |            ,customer
      |            ,date_dim
      |        where d_year = 1999
      |         and d_moy = 1
      |         and cs_sold_date_sk = d_date_sk
      |         and cs_item_sk in (select item_sk from frequent_ss_items)
      |         and cs_bill_customer_sk in (select c_customer_sk from best_ss_customer)
      |         and cs_bill_customer_sk = c_customer_sk
      |       group by c_last_name,c_first_name)
      |      union all
      |      (select c_last_name,c_first_name,cast(sum(ws_quantity*ws_list_price) as double) sales
      |       from web_sales
      |           ,customer
      |           ,date_dim
      |       where d_year = 1999
      |         and d_moy = 1
      |         and ws_sold_date_sk = d_date_sk
      |         and ws_item_sk in (select item_sk from frequent_ss_items)
      |         and ws_bill_customer_sk in (select c_customer_sk from best_ss_customer)
      |         and ws_bill_customer_sk = c_customer_sk
      |       group by c_last_name,c_first_name)) y
      |     order by c_last_name,c_first_name,sales
      |  limit 100""".stripMargin

  // query8.sql: store net profit where the store zip prefix matches a
  // qualifying customer zip (IN-list intersect preferred-customer-dense
  // zips). The pooled ca_zip values were chosen from this query's own
  // 400-literal list. Adaptation: profit sum aliased/cast per house rules.
  private val q8Body =
    """select  s_store_name
      |      ,cast(sum(ss_net_profit) as double) net_profit
      | from store_sales
      |     ,date_dim
      |     ,store,
      |     (select ca_zip
      |     from (
      |      SELECT substring(ca_zip,1,5) ca_zip
      |      FROM customer_address
      |      WHERE substring(ca_zip,1,5) IN (
      |                          '89436','30868','65085','22977','83927','77557',
      |                          '58429','40697','80614','10502','32779',
      |                          '91137','61265','98294','17921','18427',
      |                          '21203','59362','87291','84093','21505',
      |                          '17184','10866','67898','25797','28055',
      |                          '18377','80332','74535','21757','29742',
      |                          '90885','29898','17819','40811','25990',
      |                          '47513','89531','91068','10391','18846',
      |                          '99223','82637','41368','83658','86199',
      |                          '81625','26696','89338','88425','32200',
      |                          '81427','19053','77471','36610','99823',
      |                          '43276','41249','48584','83550','82276',
      |                          '18842','78890','14090','38123','40936',
      |                          '34425','19850','43286','80072','79188',
      |                          '54191','11395','50497','84861','90733',
      |                          '21068','57666','37119','25004','57835',
      |                          '70067','62878','95806','19303','18840',
      |                          '19124','29785','16737','16022','49613',
      |                          '89977','68310','60069','98360','48649',
      |                          '39050','41793','25002','27413','39736',
      |                          '47208','16515','94808','57648','15009',
      |                          '80015','42961','63982','21744','71853',
      |                          '81087','67468','34175','64008','20261',
      |                          '11201','51799','48043','45645','61163',
      |                          '48375','36447','57042','21218','41100',
      |                          '89951','22745','35851','83326','61125',
      |                          '78298','80752','49858','52940','96976',
      |                          '63792','11376','53582','18717','90226',
      |                          '50530','94203','99447','27670','96577',
      |                          '57856','56372','16165','23427','54561',
      |                          '28806','44439','22926','30123','61451',
      |                          '92397','56979','92309','70873','13355',
      |                          '21801','46346','37562','56458','28286',
      |                          '47306','99555','69399','26234','47546',
      |                          '49661','88601','35943','39936','25632',
      |                          '24611','44166','56648','30379','59785',
      |                          '11110','14329','93815','52226','71381',
      |                          '13842','25612','63294','14664','21077',
      |                          '82626','18799','60915','81020','56447',
      |                          '76619','11433','13414','42548','92713',
      |                          '70467','30884','47484','16072','38936',
      |                          '13036','88376','45539','35901','19506',
      |                          '65690','73957','71850','49231','14276',
      |                          '20005','18384','76615','11635','38177',
      |                          '55607','41369','95447','58581','58149',
      |                          '91946','33790','76232','75692','95464',
      |                          '22246','51061','56692','53121','77209',
      |                          '15482','10688','14868','45907','73520',
      |                          '72666','25734','17959','24677','66446',
      |                          '94627','53535','15560','41967','69297',
      |                          '11929','59403','33283','52232','57350',
      |                          '43933','40921','36635','10827','71286',
      |                          '19736','80619','25251','95042','15526',
      |                          '36496','55854','49124','81980','35375',
      |                          '49157','63512','28944','14946','36503',
      |                          '54010','18767','23969','43905','66979',
      |                          '33113','21286','58471','59080','13395',
      |                          '79144','70373','67031','38360','26705',
      |                          '50906','52406','26066','73146','15884',
      |                          '31897','30045','61068','45550','92454',
      |                          '13376','14354','19770','22928','97790',
      |                          '50723','46081','30202','14410','20223',
      |                          '88500','67298','13261','14172','81410',
      |                          '93578','83583','46047','94167','82564',
      |                          '21156','15799','86709','37931','74703',
      |                          '83103','23054','70470','72008','49247',
      |                          '91911','69998','20961','70070','63197',
      |                          '54853','88191','91830','49521','19454',
      |                          '81450','89091','62378','25683','61869',
      |                          '51744','36580','85778','36871','48121',
      |                          '28810','83712','45486','67393','26935',
      |                          '42393','20132','55349','86057','21309',
      |                          '80218','10094','11357','48819','39734',
      |                          '40758','30432','21204','29467','30214',
      |                          '61024','55307','74621','11622','68908',
      |                          '33032','52868','99194','99900','84936',
      |                          '69036','99149','45013','32895','59004',
      |                          '32322','14933','32936','33562','72550',
      |                          '27385','58049','58200','16808','21360',
      |                          '32961','18586','79307','15492')
      |     intersect
      |      select ca_zip
      |      from (SELECT substring(ca_zip,1,5) ca_zip,count(*) cnt
      |            FROM customer_address, customer
      |            WHERE ca_address_sk = c_current_addr_sk and
      |                  c_preferred_cust_flag='Y'
      |            group by ca_zip
      |            having count(*) > 10)A1)A2) V1
      | where ss_store_sk = s_store_sk
      |  and ss_sold_date_sk = d_date_sk
      |  and d_qoy = 1 and d_year = 2002
      |  and (substring(s_zip,1,2) = substring(V1.ca_zip,1,2))
      | group by s_store_name
      | order by s_store_name
      | limit 100
      |""".stripMargin.trim

// query39a.sql / query39b.sql: warehouse/item inventory demand
  // variability (coefficient of variation over the ~4 weekly snapshots of
  // a month) for consecutive months; 39b keeps only high-cov pairs. The
  // self-join duplicates column names, so outputs get 1/2 suffixes; mean
  // and cov round(.,4) on both engines (stddev is double arithmetic).
  private def q39Style(extraPred: String) =
    s"""with inv as
      |(select w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy
      |       ,stdev,mean, case mean when 0 then null else stdev/mean end cov
      | from(select w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy
      |            ,stddev_samp(inv_quantity_on_hand) stdev,avg(inv_quantity_on_hand) mean
      |      from inventory
      |          ,item
      |          ,warehouse
      |          ,date_dim
      |      where inv_item_sk = i_item_sk
      |        and inv_warehouse_sk = w_warehouse_sk
      |        and inv_date_sk = d_date_sk
      |        and d_year =1999
      |      group by w_warehouse_name,w_warehouse_sk,i_item_sk,d_moy) foo
      | where case mean when 0 then 0 else stdev/mean end > 1)
      |select inv1.w_warehouse_sk w_warehouse_sk1,inv1.i_item_sk i_item_sk1,inv1.d_moy d_moy1
      |      ,round(inv1.mean,4) mean1, round(inv1.cov,4) cov1
      |      ,inv2.w_warehouse_sk w_warehouse_sk2,inv2.i_item_sk i_item_sk2,inv2.d_moy d_moy2
      |      ,round(inv2.mean,4) mean2, round(inv2.cov,4) cov2
      |from inv inv1,inv inv2
      |where inv1.i_item_sk = inv2.i_item_sk
      |  and inv1.w_warehouse_sk =  inv2.w_warehouse_sk
      |  and inv1.d_moy=4
      |  and inv2.d_moy=4+1
      |$extraPred
      |order by inv1.w_warehouse_sk,inv1.i_item_sk,inv1.d_moy,inv1.mean,inv1.cov
      |        ,inv2.d_moy,inv2.mean, inv2.cov""".stripMargin
  private val q39aBody = q39Style("")
  private val q39bBody = q39Style("  and inv1.cov > 1.5")

  // query54.sql: revenue segments of customers who bought the target
  // category/class in catalog or web, then shopped at a same-county/state
  // store in the following quarter. cast(decimal/50 as int) differs
  // across engines (DuckDB rounds double->int, Spark truncates), so the
  // segment goes through an explicit floor.
  private val q54Body =
    """with my_customers as (
      | select distinct c_customer_sk
      |        , c_current_addr_sk
      | from
      |        ( select cs_sold_date_sk sold_date_sk,
      |                 cs_bill_customer_sk customer_sk,
      |                 cs_item_sk item_sk
      |          from   catalog_sales
      |          union all
      |          select ws_sold_date_sk sold_date_sk,
      |                 ws_bill_customer_sk customer_sk,
      |                 ws_item_sk item_sk
      |          from   web_sales
      |         ) cs_or_ws_sales,
      |         item,
      |         date_dim,
      |         customer
      | where   sold_date_sk = d_date_sk
      |         and item_sk = i_item_sk
      |         and i_category = 'Jewelry'
      |         and i_class = 'consignment'
      |         and c_customer_sk = cs_or_ws_sales.customer_sk
      |         and d_moy = 3
      |         and d_year = 1999
      | )
      | , my_revenue as (
      | select c_customer_sk,
      |        sum(ss_ext_sales_price) as revenue
      | from   my_customers,
      |        store_sales,
      |        customer_address,
      |        store,
      |        date_dim
      | where  c_current_addr_sk = ca_address_sk
      |        and ca_county = s_county
      |        and ca_state = s_state
      |        and ss_sold_date_sk = d_date_sk
      |        and c_customer_sk = ss_customer_sk
      |        and d_month_seq between (select distinct d_month_seq+1
      |                                 from   date_dim where d_year = 1999 and d_moy = 3)
      |                           and  (select distinct d_month_seq+3
      |                                 from   date_dim where d_year = 1999 and d_moy = 3)
      | group by c_customer_sk
      | )
      | , segments as
      | (select cast(floor(cast(revenue as double)/50) as int) as segment
      |  from   my_revenue
      | )
      |  select  segment, cast(count(*) as bigint) as num_customers, segment*50 as segment_base
      | from segments
      | group by segment
      | order by segment, num_customers
      | limit 100""".stripMargin

  // query64.sql: the widest join in the corpus — store sale+return pairs
  // of heavily-refunded catalog items across two years, with both the
  // sale-time and current customer demographics/address/income band.
  // Output self-join columns get year-1/2 aliases.
  private val q64Body =
    """with cs_ui as
      | (select cs_item_sk
      |        ,sum(cs_ext_list_price) as sale,sum(cr_refunded_cash+cr_reversed_charge+cr_store_credit) as refund
      |  from catalog_sales
      |      ,catalog_returns
      |  where cs_item_sk = cr_item_sk
      |    and cs_order_number = cr_order_number
      |  group by cs_item_sk
      |  having sum(cs_ext_list_price)>2*sum(cr_refunded_cash+cr_reversed_charge+cr_store_credit)),
      |cross_sales as
      | (select i_product_name product_name
      |     ,i_item_sk item_sk
      |     ,s_store_name store_name
      |     ,s_zip store_zip
      |     ,ad1.ca_street_number b_street_number
      |     ,ad1.ca_street_name b_street_name
      |     ,ad1.ca_city b_city
      |     ,ad1.ca_zip b_zip
      |     ,ad2.ca_street_number c_street_number
      |     ,ad2.ca_street_name c_street_name
      |     ,ad2.ca_city c_city
      |     ,ad2.ca_zip c_zip
      |     ,d1.d_year as syear
      |     ,d2.d_year as fsyear
      |     ,d3.d_year s2year
      |     ,count(*) cnt
      |     ,sum(ss_wholesale_cost) s1
      |     ,sum(ss_list_price) s2
      |     ,sum(ss_coupon_amt) s3
      |  FROM   store_sales
      |        ,store_returns
      |        ,cs_ui
      |        ,date_dim d1
      |        ,date_dim d2
      |        ,date_dim d3
      |        ,store
      |        ,customer
      |        ,customer_demographics cd1
      |        ,customer_demographics cd2
      |        ,promotion
      |        ,household_demographics hd1
      |        ,household_demographics hd2
      |        ,customer_address ad1
      |        ,customer_address ad2
      |        ,income_band ib1
      |        ,income_band ib2
      |        ,item
      |  WHERE  ss_store_sk = s_store_sk AND
      |         ss_sold_date_sk = d1.d_date_sk AND
      |         ss_customer_sk = c_customer_sk AND
      |         ss_cdemo_sk= cd1.cd_demo_sk AND
      |         ss_hdemo_sk = hd1.hd_demo_sk AND
      |         ss_addr_sk = ad1.ca_address_sk and
      |         ss_item_sk = i_item_sk and
      |         ss_item_sk = sr_item_sk and
      |         ss_ticket_number = sr_ticket_number and
      |         ss_item_sk = cs_ui.cs_item_sk and
      |         c_current_cdemo_sk = cd2.cd_demo_sk AND
      |         c_current_hdemo_sk = hd2.hd_demo_sk AND
      |         c_current_addr_sk = ad2.ca_address_sk and
      |         c_first_sales_date_sk = d2.d_date_sk and
      |         c_first_shipto_date_sk = d3.d_date_sk and
      |         ss_promo_sk = p_promo_sk and
      |         hd1.hd_income_band_sk = ib1.ib_income_band_sk and
      |         hd2.hd_income_band_sk = ib2.ib_income_band_sk and
      |         cd1.cd_marital_status <> cd2.cd_marital_status and
      |         i_color in ('maroon','burnished','dim','steel','navajo','chocolate') and
      |         i_current_price between 35 and 35 + 10 and
      |         i_current_price between 35 + 1 and 35 + 15
      |group by i_product_name
      |       ,i_item_sk
      |       ,s_store_name
      |       ,s_zip
      |       ,ad1.ca_street_number
      |       ,ad1.ca_street_name
      |       ,ad1.ca_city
      |       ,ad1.ca_zip
      |       ,ad2.ca_street_number
      |       ,ad2.ca_street_name
      |       ,ad2.ca_city
      |       ,ad2.ca_zip
      |       ,d1.d_year
      |       ,d2.d_year
      |       ,d3.d_year
      |)
      |select cs1.product_name
      |     ,cs1.store_name
      |     ,cs1.store_zip
      |     ,cs1.b_street_number
      |     ,cs1.b_street_name
      |     ,cs1.b_city
      |     ,cs1.b_zip
      |     ,cs1.c_street_number
      |     ,cs1.c_street_name
      |     ,cs1.c_city
      |     ,cs1.c_zip
      |     ,cs1.syear syear1
      |     ,cast(cs1.cnt as bigint) cnt1
      |     ,cast(cs1.s1 as double) as s11
      |     ,cast(cs1.s2 as double) as s21
      |     ,cast(cs1.s3 as double) as s31
      |     ,cast(cs2.s1 as double) as s12
      |     ,cast(cs2.s2 as double) as s22
      |     ,cast(cs2.s3 as double) as s32
      |     ,cs2.syear syear2
      |     ,cast(cs2.cnt as bigint) cnt2
      |from cross_sales cs1,cross_sales cs2
      |where cs1.item_sk=cs2.item_sk and
      |     cs1.syear = 2000 and
      |     cs2.syear = 2000 + 1 and
      |     cs2.cnt <= cs1.cnt and
      |     cs1.store_name = cs2.store_name and
      |     cs1.store_zip = cs2.store_zip
      |order by cs1.product_name
      |       ,cs1.store_name
      |       ,cs2.cnt
      |       ,cs1.s1
      |       ,cs2.s1""".stripMargin

  // query80.sql: 30-day sales/returns/profit per channel for non-TV-promo
  // items over $50 (the promo-filtered sibling of q5).
  private val q80Body =
    """with ssr as
      | (select  s_store_id as store_id,
      |          sum(ss_ext_sales_price) as sales,
      |          sum(coalesce(sr_return_amt, 0)) as returns_amt,
      |          sum(ss_net_profit - coalesce(sr_net_loss, 0)) as profit
      |  from store_sales left outer join store_returns on
      |         (ss_item_sk = sr_item_sk and ss_ticket_number = sr_ticket_number),
      |     date_dim,
      |     store,
      |     item,
      |     promotion
      | where ss_sold_date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '30' day)
      |       and ss_store_sk = s_store_sk
      |       and ss_item_sk = i_item_sk
      |       and i_current_price > 50
      |       and ss_promo_sk = p_promo_sk
      |       and p_channel_tv = 'N'
      | group by s_store_id)
      | ,
      | csr as
      | (select  cp_catalog_page_id as catalog_page_id,
      |          sum(cs_ext_sales_price) as sales,
      |          sum(coalesce(cr_return_amount, 0)) as returns_amt,
      |          sum(cs_net_profit - coalesce(cr_net_loss, 0)) as profit
      |  from catalog_sales left outer join catalog_returns on
      |         (cs_item_sk = cr_item_sk and cs_order_number = cr_order_number),
      |     date_dim,
      |     catalog_page,
      |     item,
      |     promotion
      | where cs_sold_date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '30' day)
      |        and cs_catalog_page_sk = cp_catalog_page_sk
      |       and cs_item_sk = i_item_sk
      |       and i_current_price > 50
      |       and cs_promo_sk = p_promo_sk
      |       and p_channel_tv = 'N'
      |group by cp_catalog_page_id)
      | ,
      | wsr as
      | (select  web_site_id,
      |          sum(ws_ext_sales_price) as sales,
      |          sum(coalesce(wr_return_amt, 0)) as returns_amt,
      |          sum(ws_net_profit - coalesce(wr_net_loss, 0)) as profit
      |  from web_sales left outer join web_returns on
      |         (ws_item_sk = wr_item_sk and ws_order_number = wr_order_number),
      |     date_dim,
      |     web_site,
      |     item,
      |     promotion
      | where ws_sold_date_sk = d_date_sk
      |       and d_date between cast('1998-08-04' as date)
      |                  and (cast('1998-08-04' as date) +  interval '30' day)
      |        and ws_web_site_sk = web_site_sk
      |       and ws_item_sk = i_item_sk
      |       and i_current_price > 50
      |       and ws_promo_sk = p_promo_sk
      |       and p_channel_tv = 'N'
      |group by web_site_id)
      |  select  channel
      |        , id
      |        , cast(sum(sales) as double) as sales
      |        , cast(sum(returns_amt) as double) as returns_amt
      |        , cast(sum(profit) as double) as profit
      | from
      | (select 'store channel' as channel
      |        , 'store' || store_id as id
      |        , sales
      |        , returns_amt
      |        , profit
      | from   ssr
      | union all
      | select 'catalog channel' as channel
      |        , 'catalog_page' || catalog_page_id as id
      |        , sales
      |        , returns_amt
      |        , profit
      | from  csr
      | union all
      | select 'web channel' as channel
      |        , 'web_site' || web_site_id as id
      |        , sales
      |        , returns_amt
      |        , profit
      | from   wsr
      | ) x
      | group by rollup (channel, id)
      | order by channel nulls first
      |         ,id nulls first
      | limit 100""".stripMargin

  // query84.sql: customers in a city within an income-band window whose
  // demographics row appears on a store return. City adapted to the
  // generator's 'Hopewell'; band literal kept in the generated bands.
  private val q84Body =
    """select  c_customer_id as customer_id
      |       , coalesce(c_last_name,'') || ', ' || coalesce(c_first_name,'') as customername
      | from customer
      |     ,customer_address
      |     ,customer_demographics
      |     ,household_demographics
      |     ,income_band
      |     ,store_returns
      | where ca_city	        =  'Hopewell'
      |   and c_current_addr_sk = ca_address_sk
      |   and ib_lower_bound   >=  32287
      |   and ib_upper_bound   <=  32287 + 50000
      |   and ib_income_band_sk = hd_income_band_sk
      |   and cd_demo_sk = c_current_cdemo_sk
      |   and hd_demo_sk = c_current_hdemo_sk
      |   and sr_cdemo_sk = cd_demo_sk
      | order by c_customer_id
      | limit 100""".stripMargin

  // query85.sql: web return reasons by paired refunding/returning
  // demographics and price/geo bands. Decimal AVGs go through
  // exact-sum/double-division (q9 rule); all outputs aliased + rounded.
  private val q85Body =
    """select  substring(r_reason_desc,1,20) reason_desc
      |       ,round(avg(ws_quantity),4) avg_quantity
      |       ,round(cast(sum(wr_refunded_cash) as double)/nullif(count(wr_refunded_cash),0),4) avg_refunded
      |       ,round(cast(sum(wr_fee) as double)/nullif(count(wr_fee),0),4) avg_fee
      | from web_sales, web_returns, web_page, customer_demographics cd1,
      |      customer_demographics cd2, customer_address, date_dim, reason
      | where ws_web_page_sk = wp_web_page_sk
      |   and ws_item_sk = wr_item_sk
      |   and ws_order_number = wr_order_number
      |   and ws_sold_date_sk = d_date_sk and d_year = 1998
      |   and cd1.cd_demo_sk = wr_refunded_cdemo_sk
      |   and cd2.cd_demo_sk = wr_returning_cdemo_sk
      |   and ca_address_sk = wr_refunded_addr_sk
      |   and r_reason_sk = wr_reason_sk
      |   and
      |   (
      |    (
      |     cd1.cd_marital_status = 'M'
      |     and
      |     cd1.cd_marital_status = cd2.cd_marital_status
      |     and
      |     cd1.cd_education_status = '4 yr Degree'
      |     and
      |     cd1.cd_education_status = cd2.cd_education_status
      |     and
      |     ws_sales_price between 100.00 and 150.00
      |    )
      |   or
      |    (
      |     cd1.cd_marital_status = 'D'
      |     and
      |     cd1.cd_marital_status = cd2.cd_marital_status
      |     and
      |     cd1.cd_education_status = 'Primary'
      |     and
      |     cd1.cd_education_status = cd2.cd_education_status
      |     and
      |     ws_sales_price between 50.00 and 100.00
      |    )
      |   or
      |    (
      |     cd1.cd_marital_status = 'U'
      |     and
      |     cd1.cd_marital_status = cd2.cd_marital_status
      |     and
      |     cd1.cd_education_status = 'Advanced Degree'
      |     and
      |     cd1.cd_education_status = cd2.cd_education_status
      |     and
      |     ws_sales_price between 150.00 and 200.00
      |    )
      |   )
      |   and
      |   (
      |    (
      |     ca_country = 'United States'
      |     and
      |     ca_state in ('KY', 'GA', 'NM')
      |     and ws_net_profit between 100 and 200
      |    )
      |    or
      |    (
      |     ca_country = 'United States'
      |     and
      |     ca_state in ('MT', 'OR', 'IN')
      |     and ws_net_profit between 150 and 300
      |    )
      |    or
      |    (
      |     ca_country = 'United States'
      |     and
      |     ca_state in ('WI', 'MO', 'WV')
      |     and ws_net_profit between 50 and 250
      |    )
      |   )
      |group by r_reason_desc
      |order by reason_desc
      |        ,avg_quantity
      |        ,avg_refunded
      |        ,avg_fee
      |limit 100""".stripMargin

  // private[graft]: Bench's 10x scale tier times the raw bodies against
  // re-registered corpus views (entries' run() would re-pin scale 1)
  private[graft] val bodies: Map[String, String] = Map(
    "ds05_tpcds_channel_sales_returns" -> q5Body,
    "ds08_tpcds_zip_prefix_profit" -> q8Body,
    "ds14a_tpcds_cross_channel_rollup" -> q14aBody,
    "ds14b_tpcds_cross_channel_week_pair" -> q14bBody,
    "ds23a_tpcds_frequent_best_sales" -> q23aBody,
    "ds23b_tpcds_frequent_best_customers" -> q23bBody,
    "ds39a_tpcds_inventory_cov_pairs" -> q39aBody,
    "ds39b_tpcds_inventory_cov_high" -> q39bBody,
    "ds54_tpcds_revenue_segments" -> q54Body,
    "ds64_tpcds_cross_sales_pairs" -> q64Body,
    "ds80_tpcds_channel_promo_report" -> q80Body,
    "ds84_tpcds_income_band_returns" -> q84Body,
    "ds85_tpcds_web_return_reasons" -> q85Body,
    "ds10_tpcds_county_demographics" -> q10Body,
    "ds57_tpcds_call_center_deviation" -> q57Body,
    "ds75_tpcds_sports_yoy_decline" -> q75Body,
    "ds30_tpcds_web_return_outliers" -> q30Body,
    "ds81_tpcds_catalog_return_outliers" -> q81Body,
    "ds31_tpcds_county_quarter_growth" -> q31Body,
    "ds58_tpcds_balanced_channel_items" -> q58Body,
    "ds72_tpcds_inventory_shortfall" -> q72Body,
    "ds18_tpcds_catalog_rollup_averages" -> q18Body,
    "ds49_tpcds_return_ratio_ranks" -> q49Body,
    "ds51_tpcds_cumulative_crossover" -> q51Body,
    "ds91_tpcds_call_center_losses" -> q91Body,
    "ds04_tpcds_triple_channel_growth" -> q4Body,
    "ds74_tpcds_max_paid_growth" -> q74Body,
    "ds17_tpcds_rebuy_quantity_stats" -> q17Body,
    "ds26_tpcds_catalog_demo_averages" -> q26Body,
    "ds34_tpcds_bulk_ticket_customers" -> q34Body,
    "ds35_tpcds_multichannel_dependents" -> q35Body,
    "ds86_tpcds_web_rollup_rank" -> q86Body,
    "ds12_tpcds_web_class_share" -> q12Body,
    "ds20_tpcds_catalog_class_share" -> q20Body,
    "ds15_tpcds_catalog_zip" -> q15Body,
    "ds32_tpcds_catalog_excess_discount" -> q32Body,
    "ds33_tpcds_books_manufact_tz" -> q33Body,
    "ds56_tpcds_color_items_tz" -> q56Body,
    "ds38_tpcds_all_channel_customers" -> q38Body,
    "ds87_tpcds_store_only_customers" -> q87Body,
    "ds62_tpcds_web_ship_lag_bands" -> q62Body,
    "ds66_tpcds_warehouse_month_pivot" -> q66Body,
    "ds77_tpcds_channel_profit_rollup" -> q77Body,
    "ds78_tpcds_loyal_channel_ratio" -> q78Body,
    "ds83_tpcds_return_week_shares" -> q83Body,
    "ds60_tpcds_children_september" -> q60Body,
    "ds69_tpcds_store_only_demographics" -> q69Body,
    "ds71_tpcds_mealtime_brands" -> q71Body,
    "ds76_tpcds_null_audit" -> q76Body,
    "ds92_tpcds_excess_discount" -> q92Body,
    "ds94_tpcds_web_multi_warehouse" -> q94Body,
    "ds95_tpcds_web_returned_orders" -> q95Body,
    "ds97_tpcds_channel_overlap" -> q97Body,
    "ds99_tpcds_ship_lag_bands" -> q99Body,
    "ds90_tpcds_am_pm_ratio" -> q90Body,
    "ds25_tpcds_rebuy_profit_chain" -> q25Body,
    "ds29_tpcds_rebuy_quantity_chain" -> q29Body,
    "ds37_tpcds_catalog_inventory_band" -> q37Body,
    "ds82_tpcds_store_inventory_band" -> q82Body,
    "ds40_tpcds_warehouse_refund_split" -> q40Body,
    "ds45_tpcds_web_zip_sales" -> q45Body,
    "ds02_tpcds_weekly_channel_ratio" -> q2Body,
    "ds11_tpcds_channel_growth" -> q11Body,
    "ds16_tpcds_multi_warehouse_ship" -> q16Body,
    "ds21_tpcds_inventory_shift" -> q21Body,
    "ds22_tpcds_inventory_rollup" -> q22Body,
    "ds24a_tpcds_pale_netpaid" -> q24Body("pale"),
    "ds24b_tpcds_chiffon_netpaid" -> q24Body("chiffon"),
    "ds06_tpcds_state_price_premium" -> q6Body,
    "ds61_tpcds_promo_share" -> q61Body,
    "ds93_tpcds_warranty_net_sales" -> q93Body,
    "ds01_tpcds_return_outliers" -> q1Body,
    "ds50_tpcds_return_lag_bands" -> q50Body,
    "ds07_tpcds_promo_demographics" -> q7Body,
    "ds13_tpcds_or_band_averages" -> q13Body,
    "ds19_tpcds_brand_zip_mismatch" -> q19Body,
    "ds27_tpcds_item_state_rollup" -> q27Body,
    "ds46_tpcds_weekend_city_carts" -> q46Body,
    "ds48_tpcds_band_quantity" -> q48Body,
    "ds68_tpcds_city_ticket_extract" -> q68Body,
    "ds09_tpcds_quantity_buckets" -> q9Body,
    "ds36_tpcds_margin_rollup" -> q36Body,
    "ds59_tpcds_weekly_yoy" -> q59Body,
    "ds67_tpcds_rollup_rank" -> q67Body,
    "ds70_tpcds_state_hierarchy" -> q70Body,
    "ds28_tpcds_bucket_stats" -> q28Body,
    "ds41_tpcds_manufact_exists" -> q41Body,
    "ds44_tpcds_best_worst_rank" -> q44Body,
    "ds47_tpcds_lag_lead_windows" -> q47Body,
    "ds43_tpcds_weekday_pivot" -> q43Body,
    "ds53_tpcds_quarterly_deviation" -> q53Body,
    "ds63_tpcds_monthly_deviation" -> q63Body,
    "ds89_tpcds_rolling_deviation" -> q89Body,
    "ds03_tpcds_brand_year" -> q3Body,
    "ds42_tpcds_category_month" -> q42Body,
    "ds52_tpcds_brand_month" -> q52Body,
    "ds55_tpcds_brand_manager" -> q55Body,
    "ds65_tpcds_underperf_items" -> q65Body,
    "ds73_tpcds_ticket_counts" -> q73Body,
    "ds79_tpcds_city_profit" -> q79Body,
    "ds88_tpcds_timeband_counts" -> q88Body,
    "ds96_tpcds_rush_hour" -> q96Body,
    "ds98_tpcds_class_ratio" -> q98Body)

  private def run(body: String)(s: SparkSession, dir: String): DataFrame = {
    TpcDs.ensure(s)
    s.sql(body)
  }

  override val entries: Map[String, (SparkSession, String) => DataFrame] =
    bodies.map { case (name, body) => name -> (run(body) _) }

  override val oracles: Map[String, String] =
    bodies.map { case (name, body) => name -> TpcDs.oracleSql(body) }
}
