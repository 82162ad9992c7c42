package graft.queries

/** Stage coverage (SURVEY §2.1-§2.6, §2.8-§2.9): every aggregation-pipeline
  * stage the reference supports, exercised through the pipeline compiler over
  * the TESTDATA tables, with a DuckDB oracle per query.
  */
object CoreQueries {

  val all: Seq[Q] = Seq(
    // -- $match: comparison + implicit equality (docs/query.md:5-84)
    Q.pipe("q_match_basic", "lineitem",
      """[{"$match":{"l_returnflag":"R","l_quantity":{"$gt":45}}},
          {"$project":{"l_orderkey":1,"l_linenumber":1,"l_quantity":1,"l_returnflag":1}}]""",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
         FROM lineitem WHERE l_returnflag='R' AND l_quantity>45"""),

    // -- $match: $and/$or/$nor/$nin logical operators (docs/query.md:86-132)
    Q.pipe("q_match_logical", "orders",
      """[{"$match":{"$or":[{"o_orderstatus":"F"},{"o_totalprice":{"$lt":1000}}],
                     "o_orderpriority":{"$nin":["1-URGENT","2-HIGH"]}}},
          {"$project":{"o_orderkey":1,"o_orderstatus":1,"o_totalprice":1,"o_orderpriority":1}}]""",
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
         FROM orders WHERE (o_orderstatus='F' OR o_totalprice<1000)
           AND o_orderpriority NOT IN ('1-URGENT','2-HIGH')"""),

    // -- $match: $regex with $options (docs/query.md:154-194)
    Q.pipe("q_match_regex", "part",
      """[{"$match":{"p_name":{"$regex":"^[BL].*(ROD|BOLT)$","$options":"i"}}},
          {"$project":{"p_partkey":1,"p_name":1}}]""",
      """SELECT p_partkey, p_name FROM part
         WHERE regexp_matches(p_name, '(?i)^[BL].*(ROD|BOLT)$')"""),

    // -- $match: $expr aggregation-expression predicate (docs/query.md:154-160)
    Q.pipe("q_match_expr", "lineitem",
      """[{"$match":{"$expr":{"$gt":["$l_discount","$l_tax"]}}},
          {"$project":{"l_orderkey":1,"l_linenumber":1,"l_discount":1,"l_tax":1}}]""",
      """SELECT l_orderkey, l_linenumber, l_discount, l_tax
         FROM lineitem WHERE l_discount > l_tax"""),

    // -- $match: $in + $exists (docs/query.md:57,134-143)
    Q.pipe("q_match_in_exists", "customer",
      """[{"$match":{"c_mktsegment":{"$in":["BUILDING","AUTOMOBILE"]},
                     "c_name":{"$exists":true}}},
          {"$project":{"c_custkey":1,"c_mktsegment":1}}]""",
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND c_name IS NOT NULL"""),

    // -- $match: $mod + bitwise operators (docs/query.md:161-176,231-275)
    Q.pipe("q_match_mod_bits", "orders",
      """[{"$match":{"o_orderkey":{"$mod":[7,3],"$bitsAllSet":5}}},
          {"$project":{"o_orderkey":1}}]""",
      """SELECT o_orderkey FROM orders
         WHERE o_orderkey % 7 = 3 AND (o_orderkey & 5) = 5"""),

    // -- $match: array operators $all / $elemMatch / $size (docs/query.md:196-229)
    Q.pipe("q_match_array", "documents",
      """[{"$addFields":{"tokens":{"$split":["$text"," "]}}},
          {"$match":{"tokens":{"$all":["the"],"$elemMatch":{"$regex":"^data"}}}},
          {"$project":{"doc_id":1,"n":{"$size":"$tokens"}}}]""",
      """SELECT doc_id, CAST(len(string_split(text,' ')) AS INT) AS n
         FROM documents
         WHERE list_contains(string_split(text,' '), 'the')
           AND len(list_filter(string_split(text,' '), x -> regexp_matches(x,'^data'))) > 0"""),

    // -- $project: computed fields (docs/aggregation_stages.md:468-489)
    Q.pipe("q_project_compute", "lineitem",
      """[{"$project":{"l_orderkey":1,"l_linenumber":1,
           "revenue":{"$multiply":["$l_extendedprice",{"$subtract":[1,"$l_discount"]}]},
           "flagstatus":{"$concat":["$l_returnflag","-","$l_linestatus"]}}}]""",
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1 - l_discount) AS revenue,
                l_returnflag || '-' || l_linestatus AS flagstatus
         FROM lineitem"""),

    // -- $project: exclusion mode
    Q.pipe("q_project_exclude", "customer",
      """[{"$project":{"c_name":0,"c_acctbal":0}}]""",
      """SELECT c_custkey, c_nationkey, c_mktsegment FROM customer"""),

    // -- $addFields/$set + $unset (docs/aggregation_stages.md:6-26,823-838)
    Q.pipe("q_addfields_unset", "supplier",
      """[{"$addFields":{"acct_eur":{"$trunc":[{"$multiply":["$s_acctbal",0.92]},2]},
                         "nation_mod":{"$mod":["$s_nationkey",5]}}},
          {"$unset":"s_name"}]""",
      """SELECT s_suppkey, s_nationkey, s_acctbal,
                trunc((s_acctbal*0.92)*100.0)/100.0 AS acct_eur,
                s_nationkey % 5 AS nation_mod
         FROM supplier"""),

    // -- $replaceRoot (docs/aggregation_stages.md:515-531)
    Q.pipe("q_replaceroot", "orders",
      """[{"$addFields":{"sub":{"k":"$o_orderkey","total":"$o_totalprice"}}},
          {"$replaceRoot":{"newRoot":"$sub"}}]""",
      """SELECT o_orderkey AS k, o_totalprice AS total FROM orders"""),

    // -- $group: $sum/$avg/$min/$max/$count accumulators; exact-integer sums
    Q.pipe("q_group_accum", "lineitem",
      """[{"$group":{"_id":"$l_returnflag",
           "sum_qty":{"$sum":"$l_quantity"},
           "n":{"$count":{}},
           "min_price":{"$min":"$l_extendedprice"},
           "max_price":{"$max":"$l_extendedprice"},
           "avg_qty":{"$avg":"$l_quantity"},
           "sum_cents":{"$sum":{"$toLong":{"$round":{"$multiply":["$l_extendedprice",100]}}}}}}]""",
      """SELECT l_returnflag AS _id, sum(l_quantity) AS sum_qty,
                count(*) AS n, min(l_extendedprice) AS min_price,
                max(l_extendedprice) AS max_price, avg(l_quantity) AS avg_qty,
                CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
         FROM lineitem GROUP BY 1"""),

    // -- $group: $addToSet (sorted for determinism)
    Q.pipe("q_group_collect", "orders",
      """[{"$group":{"_id":"$o_orderstatus",
           "prios":{"$addToSet":"$o_orderpriority"},"n":{"$count":{}}}},
          {"$addFields":{"prios":{"$jsonToString":{"$sort":{"input":"$prios"}}}}}]""",
      """SELECT o_orderstatus AS _id,
                to_json(list_sort(list(DISTINCT o_orderpriority)))::VARCHAR AS prios,
                count(*) AS n
         FROM orders GROUP BY 1"""),

    // -- $group: $push (+ array $sort operator for determinism)
    Q.pipe("q_group_push", "lineitem",
      """[{"$match":{"l_orderkey":{"$lt":100}}},
          {"$group":{"_id":"$l_orderkey","lines":{"$push":"$l_linenumber"}}},
          {"$addFields":{"lines":{"$jsonToString":{"$sort":{"input":"$lines"}}}}}]""",
      """SELECT l_orderkey AS _id, to_json(list_sort(list(l_linenumber)))::VARCHAR AS lines
         FROM lineitem WHERE l_orderkey<100 GROUP BY 1"""),

    // -- $group: $stdDevPop (rounded: Welford merge order differs)
    Q.pipe("q_group_stddev", "lineitem",
      """[{"$group":{"_id":"$l_returnflag","sd":{"$stdDevPop":"$l_quantity"}}},
          {"$addFields":{"sd":{"$round":["$sd",6]}}}]""",
      """SELECT l_returnflag AS _id, round(stddev_pop(l_quantity),6) AS sd
         FROM lineitem GROUP BY 1"""),

    // -- $group: $last (deterministic: single-row groups)
    Q.pipe("q_group_last", "orders",
      """[{"$group":{"_id":"$o_orderkey","tp":{"$last":"$o_totalprice"}}}]""",
      """SELECT o_orderkey AS _id, o_totalprice AS tp FROM orders"""),

    // -- $group: $mergeObjects with the __ord determinism stamp — per-field
    // last-non-null ranked by __ord, not partition arrival order
    // (docs/aggregation_stages.md:35; Mongo merge ignores null/missing).
    // Field a is only present on 'O' orders, b only on 'F' — the merge must
    // pick each field's latest non-null independently.
    Q.pipe("q_group_mergeobjects", "orders",
      """[{"$addFields":{"__ord":"$o_orderkey",
           "v":{"a":{"$cond":[{"$eq":["$o_orderstatus","O"]},"$o_orderpriority",null]},
                "b":{"$cond":[{"$eq":["$o_orderstatus","F"]},"$o_totalprice",null]}}}},
          {"$group":{"_id":"$o_custkey","m":{"$mergeObjects":"$v"}}},
          {"$project":{"_id":1,"a":"$m.a","b":"$m.b"}}]""",
      """SELECT o_custkey AS _id,
                arg_max(CASE WHEN o_orderstatus='O' THEN o_orderpriority END,
                        CASE WHEN o_orderstatus='O' THEN o_orderkey END) AS a,
                arg_max(CASE WHEN o_orderstatus='F' THEN o_totalprice END,
                        CASE WHEN o_orderstatus='F' THEN o_orderkey END) AS b
         FROM orders GROUP BY 1"""),

    // -- $group: $first/$last with the __ord stamp (deterministic arrival
    // order even over multi-row groups; event_id is unique → no tie-break)
    Q.pipe("q_group_first_last_ord", "events",
      """[{"$addFields":{"__ord":"$event_id"}},
          {"$group":{"_id":"$user_id",
            "first_type":{"$first":"$event_type"},
            "last_value":{"$last":"$value"}}}]""",
      """SELECT user_id AS _id,
                arg_min(event_type, event_id) AS first_type,
                arg_max(value, event_id) AS last_value
         FROM events GROUP BY 1"""),

    // -- $bucket (docs/aggregation_stages.md:29-71)
    Q.pipe("q_bucket", "customer",
      """[{"$bucket":{"groupBy":"$c_acctbal",
           "boundaries":[-1000,0,2000,4000,6000,8000],
           "default":-9999,
           "output":{"n":{"$count":{}},
             "bal_cents":{"$sum":{"$toLong":{"$round":{"$multiply":["$c_acctbal",100]}}}}}}}]""",
      """SELECT CASE
                  WHEN c_acctbal>=-1000 AND c_acctbal<0 THEN -1000
                  WHEN c_acctbal>=0 AND c_acctbal<2000 THEN 0
                  WHEN c_acctbal>=2000 AND c_acctbal<4000 THEN 2000
                  WHEN c_acctbal>=4000 AND c_acctbal<6000 THEN 4000
                  WHEN c_acctbal>=6000 AND c_acctbal<8000 THEN 6000
                  ELSE -9999 END AS _id,
                count(*) AS n,
                CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
         FROM customer GROUP BY 1"""),

    // -- $count stage (docs/aggregation_stages.md:73-91)
    Q.pipe("q_count", "lineitem",
      """[{"$match":{"l_quantity":{"$gte":30}}},{"$count":"n"}]""",
      """SELECT count(*) AS n FROM lineitem WHERE l_quantity>=30"""),

    // -- $unwind (docs/aggregation_stages.md:840-855)
    Q.pipe("q_unwind", "documents",
      """[{"$match":{"doc_id":{"$lt":200}}},
          {"$addFields":{"tokens":{"$split":["$text"," "]}}},
          {"$unwind":"$tokens"},
          {"$project":{"doc_id":1,"tokens":1}}]""",
      """SELECT doc_id, unnest(string_split(text,' ')) AS tokens
         FROM documents WHERE doc_id<200"""),

    // -- $lookup with unwind (inner join; docs/aggregation_stages.md:346-372)
    Q.pipe("q_lookup_unwind", "lineitem",
      """[{"$match":{"l_orderkey":{"$lt":1000}}},
          {"$lookup":{"from":"orders","localField":"l_orderkey",
                      "foreignField":"o_orderkey","as":"ord","unwind":true}},
          {"$project":{"l_orderkey":1,"l_linenumber":1,
                       "status":"$ord.o_orderstatus","total":"$ord.o_totalprice"}}]""",
      """SELECT l_orderkey, l_linenumber, o_orderstatus AS status,
                o_totalprice AS total
         FROM lineitem JOIN orders ON l_orderkey=o_orderkey
         WHERE l_orderkey<1000"""),

    // -- $lookup producing the `as` array (left outer; size of matches)
    Q.pipe("q_lookup_array", "customer",
      """[{"$lookup":{"from":"orders","localField":"c_custkey",
                      "foreignField":"o_custkey","as":"ords"}},
          {"$project":{"c_custkey":1,"n_orders":{"$size":"$ords"}}}]""",
      """SELECT c_custkey, CAST(count(o_orderkey) AS INT) AS n_orders
         FROM customer LEFT JOIN orders ON o_custkey=c_custkey
         GROUP BY c_custkey"""),

    // -- $lookup correlated form: let + pipeline (docs/aggregation_stages.md:346)
    Q.pipe("q_lookup_let", "lineitem",
      """[{"$match":{"l_orderkey":{"$lt":500}}},
          {"$lookup":{"from":"part","as":"p","let":{"pk":"$l_partkey"},
                      "pipeline":[{"$match":{"p_partkey":"$$pk"}}],"unwind":true}},
          {"$project":{"l_orderkey":1,"l_linenumber":1,"pname":"$p.p_name"}}]""",
      """SELECT l_orderkey, l_linenumber, p_name AS pname
         FROM lineitem JOIN part ON p_partkey=l_partkey
         WHERE l_orderkey<500"""),

    // -- $redact (docs/aggregation_stages.md:491-513): compile-time recursion
    Q.pipe("q_redact", "documents",
      """[{"$addFields":{"meta":{"lang":"$lang","src":"$source"}}},
          {"$redact":{"$cond":{"if":{"$eq":["$lang","en"]},
                               "then":"$$DESCEND","else":"$$PRUNE"}}},
          {"$project":{"doc_id":1,"lang":1,"msrc":"$meta.src"}}]""",
      """SELECT doc_id, lang, source AS msrc FROM documents WHERE lang='en'"""),

    // -- $validate (docs/aggregation_stages.md:857-879, docs/validator.md)
    Q.pipe("q_validate", "orders",
      """[{"$validate":{"conditions":[
            {"o_totalprice":{"$lt":100000},"$code":"MAXP"},
            {"o_orderstatus":{"$in":["F","O","P"]},"$code":"STAT"}]}},
          {"$project":{"o_orderkey":1,"_error":1,
                       "codes":{"$jsonToString":{"$map":{"input":"$errors","as":"e","in":"$$e.code"}}}}}]""",
      """SELECT o_orderkey,
                CASE WHEN o_totalprice>=100000 THEN true END AS _error,
                CASE WHEN o_totalprice>=100000 THEN to_json(['MAXP'])::VARCHAR END AS codes
         FROM orders"""),

    // -- $deduplicate (docs/aggregation_stages.md:93-116), batch form
    Q.pipe("q_deduplicate", "documents",
      """[{"$deduplicate":{"expression":"$text"}},{"$project":{"text":1}}]""",
      """SELECT DISTINCT text FROM documents"""),

    // -- $per batching (docs/aggregation_stages.md:393-411), batch form
    Q.pipe("q_per", "region",
      """[{"$per":{"amount":2,"as":"batch"}},
          {"$project":{"n":{"$size":"$batch"},
                       "keys":{"$jsonToString":{"$sort":{"input":{"$map":{"input":"$batch","as":"b","in":"$$b.r_regionkey"}}}}}}}]""",
      """WITH b AS (SELECT r_regionkey,
                    CAST(floor((row_number() OVER (ORDER BY r_regionkey)-1)/2) AS BIGINT) AS g
                    FROM region)
         SELECT CAST(count(*) AS INT) AS n,
                to_json(list(r_regionkey ORDER BY r_regionkey))::VARCHAR AS keys
         FROM b GROUP BY g"""),

    // -- $setKey (docs/aggregation_stages.md:571-589): `_key` column = Kafka key
    Q.pipe("q_setkey", "nation",
      """[{"$setKey":{"$concat":["$n_name","-",{"$toString":"$n_regionkey"}]}}]""",
      """SELECT n_nationkey, n_name, n_regionkey,
                n_name || '-' || CAST(n_regionkey AS VARCHAR) AS _key
         FROM nation"""),

    // -- $send (docs/aggregation_stages.md:550-565): dynamic `_topic` routing
    Q.pipe("q_send", "events",
      """[{"$match":{"event_id":{"$lt":1000}}},
          {"$send":{"topic":{"$concat":["t-","$event_type"]}}},
          {"$project":{"event_id":1,"_topic":1}}]""",
      """SELECT event_id, 't-' || event_type AS _topic
         FROM events WHERE event_id<1000""")
  )
}
