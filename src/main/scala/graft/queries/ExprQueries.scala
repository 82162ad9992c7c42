package graft.queries

/** Expression-operator coverage (SURVEY §2.7): every operator family of
  * docs/aggregation_operators.md exercised with a DuckDB oracle.
  * Transcendentals are rounded to 9 decimals (libm implementations differ in
  * the last ulp); casts/truncation avoid DuckDB's round-on-int-cast.
  */
object ExprQueries {

  val all: Seq[Q] = Seq(
    // -- arithmetic family
    Q.pipe("q_expr_arith", "lineitem",
      """[{"$match":{"l_orderkey":{"$lt":2000}}},
          {"$project":{"l_orderkey":1,"l_linenumber":1,
            "a_abs":{"$abs":{"$subtract":["$l_discount","$l_tax"]}},
            "a_add":{"$add":["$l_quantity","$l_linenumber",1]},
            "a_ceil":{"$ceil":{"$multiply":["$l_discount",100]}},
            "a_floor":{"$floor":{"$multiply":["$l_tax",100]}},
            "a_div":{"$divide":["$l_extendedprice","$l_quantity"]},
            "a_exp":{"$round":[{"$exp":"$l_discount"},9]},
            "a_ln":{"$round":[{"$ln":{"$add":["$l_quantity",1]}},9]},
            "a_log":{"$round":[{"$log":[{"$add":["$l_quantity",1]},2]},9]},
            "a_log10":{"$round":[{"$log10":{"$add":["$l_quantity",1]}},9]},
            "a_mod":{"$mod":["$l_orderkey",97]},
            "a_pow":{"$pow":["$l_quantity",2]},
            "a_sqrt":{"$sqrt":"$l_quantity"},
            "a_trunc":{"$trunc":[{"$multiply":["$l_extendedprice",0.1]},1]}}}]""",
      """SELECT l_orderkey, l_linenumber,
            abs(l_discount - l_tax) AS a_abs,
            l_quantity + l_linenumber + 1 AS a_add,
            CAST(ceil(l_discount*100) AS BIGINT) AS a_ceil,
            CAST(floor(l_tax*100) AS BIGINT) AS a_floor,
            l_extendedprice / l_quantity AS a_div,
            round(exp(l_discount),9) AS a_exp,
            round(ln(l_quantity + 1),9) AS a_ln,
            round(ln(l_quantity + 1)/ln(2),9) AS a_log,
            round(log(l_quantity + 1),9) AS a_log10,
            l_orderkey % 97 AS a_mod,
            pow(l_quantity, 2) AS a_pow,
            sqrt(l_quantity) AS a_sqrt,
            trunc((l_extendedprice*0.1)*10.0)/10.0 AS a_trunc
         FROM lineitem WHERE l_orderkey<2000"""),

    // -- trigonometry family (t in [-0.01, 0.1] keeps every domain valid)
    Q.pipe("q_expr_trig", "supplier",
      """[{"$addFields":{"t":{"$divide":["$s_acctbal",100000]}}},
          {"$project":{"s_suppkey":1,
            "v_sin":{"$round":[{"$sin":"$t"},9]},
            "v_cos":{"$round":[{"$cos":"$t"},9]},
            "v_tan":{"$round":[{"$tan":"$t"},9]},
            "v_asin":{"$round":[{"$asin":"$t"},9]},
            "v_acos":{"$round":[{"$acos":"$t"},9]},
            "v_atan":{"$round":[{"$atan":"$t"},9]},
            "v_atan2":{"$round":[{"$atan2":["$t",1]},9]},
            "v_sinh":{"$round":[{"$sinh":"$t"},9]},
            "v_cosh":{"$round":[{"$cosh":"$t"},9]},
            "v_tanh":{"$round":[{"$tanh":"$t"},9]},
            "v_asinh":{"$round":[{"$asinh":"$t"},9]},
            "v_acosh":{"$round":[{"$acosh":{"$add":[1,{"$abs":"$t"}]}},9]},
            "v_atanh":{"$round":[{"$atanh":"$t"},9]},
            "v_rad":{"$round":[{"$degreesToRadians":"$t"},9]},
            "v_deg":{"$round":[{"$radiansToDegrees":"$t"},9]}}}]""",
      """SELECT s_suppkey,
            round(sin(s_acctbal/100000),9) AS v_sin,
            round(cos(s_acctbal/100000),9) AS v_cos,
            round(tan(s_acctbal/100000),9) AS v_tan,
            round(asin(s_acctbal/100000),9) AS v_asin,
            round(acos(s_acctbal/100000),9) AS v_acos,
            round(atan(s_acctbal/100000),9) AS v_atan,
            round(atan2(s_acctbal/100000, 1),9) AS v_atan2,
            round((exp(s_acctbal/100000)-exp(-(s_acctbal/100000)))/2,9) AS v_sinh,
            round((exp(s_acctbal/100000)+exp(-(s_acctbal/100000)))/2,9) AS v_cosh,
            round((exp(2*(s_acctbal/100000))-1)/(exp(2*(s_acctbal/100000))+1),9) AS v_tanh,
            round(ln(s_acctbal/100000 + sqrt((s_acctbal/100000)*(s_acctbal/100000)+1)),9) AS v_asinh,
            round(ln((1+abs(s_acctbal/100000)) + sqrt((1+abs(s_acctbal/100000))*(1+abs(s_acctbal/100000))-1)),9) AS v_acosh,
            round(0.5*ln((1+s_acctbal/100000)/(1-s_acctbal/100000)),9) AS v_atanh,
            round(radians(s_acctbal/100000),9) AS v_rad,
            round(degrees(s_acctbal/100000),9) AS v_deg
         FROM supplier"""),

    // -- string family
    Q.pipe("q_expr_string", "part",
      """[{"$match":{"p_partkey":{"$lt":500}}},
          {"$project":{"p_partkey":1,
            "s_concat":{"$concat":["$p_brand",":","$p_type"]},
            "s_lower":{"$toLower":"$p_name"},
            "s_upper":{"$toUpper":"$p_name"},
            "s_len":{"$strLenCP":"$p_name"},
            "s_sub":{"$substrCP":["$p_name",0,8]},
            "s_idx":{"$indexOfCP":["$p_name","a"]},
            "s_split_n":{"$size":{"$split":["$p_name"," "]}},
            "s_trim":{"$trim":{"input":{"$concat":["  ","$p_brand","  "]}}},
            "s_rep_all":{"$replaceAll":{"input":"$p_name","find":"a","replacement":"@"}},
            "s_rep_one":{"$replaceOne":{"input":"$p_name","find":"a","replacement":"@"}},
            "s_casecmp":{"$strcasecmp":["$p_brand","$p_type"]},
            "s_b64":{"$base64Encode":"$p_brand"},
            "s_b64d":{"$base64Decode":{"$base64Encode":"$p_brand"}},
            "s_regex_m":{"$regexMatch":{"input":"$p_name","regex":"red"}}}}]""",
      """SELECT p_partkey,
            p_brand || ':' || p_type AS s_concat,
            lower(p_name) AS s_lower,
            upper(p_name) AS s_upper,
            CAST(length(p_name) AS INT) AS s_len,
            substr(p_name, 1, 8) AS s_sub,
            CAST(strpos(p_name, 'a') - 1 AS INT) AS s_idx,
            CAST(len(string_split(p_name,' ')) AS INT) AS s_split_n,
            p_brand AS s_trim,
            replace(p_name, 'a', '@') AS s_rep_all,
            regexp_replace(p_name, 'a', '@') AS s_rep_one,
            CASE WHEN lower(p_brand) < lower(p_type) THEN -1
                 WHEN lower(p_brand) > lower(p_type) THEN 1 ELSE 0 END AS s_casecmp,
            base64(p_brand::BLOB) AS s_b64,
            p_brand AS s_b64d,
            regexp_matches(p_name, 'red') AS s_regex_m
         FROM part WHERE p_partkey<500"""),

    // -- $regexFind / $regexFindAll
    Q.pipe("q_expr_regex_find", "documents",
      """[{"$match":{"doc_id":{"$lt":300}}},
          {"$addFields":{"f":{"$regexFind":{"input":"$text","regex":"[A-Za-z]+ing"}}}},
          {"$project":{"doc_id":1,"m":"$f.match",
            "n_all":{"$size":{"$regexFindAll":{"input":"$text","regex":"the"}}}}}]""",
      """SELECT doc_id,
            CASE WHEN regexp_matches(text,'[A-Za-z]+ing')
                 THEN regexp_extract(text,'[A-Za-z]+ing') END AS m,
            CAST(len(regexp_extract_all(text,'the')) AS INT) AS n_all
         FROM documents WHERE doc_id<300"""),

    // -- conditional family: $cond / $switch / $ifNull
    Q.pipe("q_expr_cond", "customer",
      """[{"$project":{"c_custkey":1,
            "tier":{"$switch":{"branches":[
               {"case":{"$gte":["$c_acctbal",5000]},"then":"high"},
               {"case":{"$gte":["$c_acctbal",0]},"then":"mid"}],
               "default":"low"}},
            "is_bld":{"$cond":{"if":{"$eq":["$c_mktsegment","BUILDING"]},"then":1,"else":0}},
            "nn":{"$ifNull":[null,"$c_name","x"]}}}]""",
      """SELECT c_custkey,
            CASE WHEN c_acctbal>=5000 THEN 'high'
                 WHEN c_acctbal>=0 THEN 'mid' ELSE 'low' END AS tier,
            CASE WHEN c_mktsegment='BUILDING' THEN 1 ELSE 0 END AS is_bld,
            c_name AS nn
         FROM customer"""),

    // -- comparison family: $cmp/$eq/$ne/$gt/$gte/$lt/$lte
    Q.pipe("q_expr_cmp", "lineitem",
      """[{"$match":{"l_orderkey":{"$lt":2000}}},
          {"$project":{"l_orderkey":1,"l_linenumber":1,
            "c_cmp":{"$cmp":["$l_discount","$l_tax"]},
            "c_eq":{"$eq":["$l_returnflag","R"]},
            "c_ne":{"$ne":["$l_linestatus","O"]},
            "c_gt":{"$gt":["$l_quantity",25]},
            "c_gte":{"$gte":["$l_quantity",25]},
            "c_lt":{"$lt":["$l_quantity",25]},
            "c_lte":{"$lte":["$l_quantity",25]}}}]""",
      """SELECT l_orderkey, l_linenumber,
            CASE WHEN l_discount<l_tax THEN -1 WHEN l_discount>l_tax THEN 1 ELSE 0 END AS c_cmp,
            l_returnflag='R' AS c_eq,
            l_linestatus<>'O' AS c_ne,
            l_quantity>25 AS c_gt,
            l_quantity>=25 AS c_gte,
            l_quantity<25 AS c_lt,
            l_quantity<=25 AS c_lte
         FROM lineitem WHERE l_orderkey<2000"""),

    // -- ISO-8601 date family
    Q.pipe("q_expr_date", "lineitem",
      """[{"$match":{"l_orderkey":{"$lt":3000}}},
          {"$project":{"l_orderkey":1,"l_linenumber":1,
            "y":{"$toYear":"$l_shipdate"},
            "m":{"$toMonth":"$l_shipdate"},
            "d":{"$toDay":"$l_shipdate"},
            "ems":{"$toEpochMillis":"$l_shipdate"},
            "esec":{"$toEpochSeconds":"$l_shipdate"},
            "iso":{"$fromEpochMillis":{"$toEpochMillis":"$l_shipdate"}},
            "dt":{"$toDate":"$l_shipdate"}}}]""",
      """SELECT l_orderkey, l_linenumber,
            CAST(year(l_shipdate) AS INT) AS y,
            CAST(month(l_shipdate) AS INT) AS m,
            CAST(day(l_shipdate) AS INT) AS d,
            epoch_ms(l_shipdate) AS ems,
            CAST(epoch(l_shipdate) AS BIGINT) AS esec,
            strftime(l_shipdate, '%Y-%m-%dT%H:%M:%S.%gZ') AS iso,
            strftime(l_shipdate, '%Y-%m-%d') AS dt
         FROM lineitem WHERE l_orderkey<3000"""),

    // -- array family
    Q.pipe("q_expr_array", "documents",
      """[{"$match":{"doc_id":{"$lt":150}}},
          {"$addFields":{"toks":{"$split":["$text"," "]}}},
          {"$project":{"doc_id":1,
            "n":{"$size":"$toks"},
            "first":{"$first":"$toks"},
            "last":{"$last":"$toks"},
            "elem2":{"$arrayElemAt":["$toks",2]},
            "elemm1":{"$arrayElemAt":["$toks",-1]},
            "has_the":{"$in":["the","$toks"]},
            "idx_the":{"$indexOfArray":["$toks","the"]},
            "sl":{"$jsonToString":{"$slice":["$toks",3]}},
            "sl2":{"$jsonToString":{"$slice":["$toks",1,2]}},
            "lens":{"$jsonToString":{"$map":{"input":{"$slice":["$toks",3]},"as":"t","in":{"$strLenCP":"$$t"}}}},
            "longs":{"$jsonToString":{"$filter":{"input":{"$slice":["$toks",5]},"as":"t","cond":{"$gt":[{"$strLenCP":"$$t"},4]}}}},
            "joined":{"$reduce":{"input":{"$slice":["$toks",3]},"initialValue":"","in":{"$concat":["$$value","_","$$this"]}}},
            "rng":{"$jsonToString":{"$range":[0,{"$mod":["$doc_id",5]},1]}},
            "revfirst":{"$first":{"$reverseArray":"$toks"}},
            "cat_n":{"$size":{"$concatArrays":[{"$slice":["$toks",2]},{"$slice":["$toks",2]}]}},
            "zipped":{"$jsonToString":{"$zip":[{"$slice":["$toks",2]},{"$slice":["$toks",2]}]}},
            "em":{"$elemMatch":["$toks",{"$regex":"^d"}]}}}]""",
      """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks
                    FROM documents WHERE doc_id<150)
         SELECT doc_id,
            CAST(len(toks) AS INT) AS n,
            toks[1] AS first,
            toks[-1] AS last,
            toks[3] AS elem2,
            toks[-1] AS elemm1,
            list_contains(toks,'the') AS has_the,
            CAST(coalesce(list_position(toks,'the'),0)-1 AS BIGINT) AS idx_the,
            to_json(toks[1:3])::VARCHAR AS sl,
            to_json(toks[2:3])::VARCHAR AS sl2,
            to_json(list_transform(toks[1:3], x -> CAST(length(x) AS INT)))::VARCHAR AS lens,
            to_json(list_filter(toks[1:5], x -> length(x)>4))::VARCHAR AS longs,
            list_reduce(list_prepend('', toks[1:3]), (a,b) -> a || '_' || b) AS joined,
            to_json(range(0, doc_id % 5, 1))::VARCHAR AS rng,
            list_reverse(toks)[1] AS revfirst,
            CAST(len(toks[1:2] || toks[1:2]) AS INT) AS cat_n,
            to_json(list_transform(range(1, least(len(toks),2)+1), i -> [toks[i], toks[i]]))::VARCHAR AS zipped,
            list_filter(toks, x -> regexp_matches(x,'^d'))[1] AS em
         FROM t"""),

    // -- set family (sorted/dedup'd for determinism)
    Q.pipe("q_expr_set", "documents",
      """[{"$match":{"doc_id":{"$lt":150}}},
          {"$addFields":{"t":{"$split":["$text"," "]}}},
          {"$addFields":{"a":{"$slice":["$t",5]},"b":{"$slice":["$t",2,5]}}},
          {"$project":{"doc_id":1,
            "su":{"$jsonToString":{"$setUnion":["$a","$b"]}},
            "si":{"$jsonToString":{"$setIntersection":["$a","$b"]}},
            "sd":{"$jsonToString":{"$setDifference":["$a","$b"]}},
            "seq":{"$setEquals":["$a","$b"]},
            "sub":{"$setIsSubset":[{"$slice":["$t",2]},"$a"]},
            "all_t":{"$allElementsTrue":{"$map":{"input":"$a","as":"x","in":{"$gt":[{"$strLenCP":"$$x"},0]}}}},
            "any_t":{"$anyElementTrue":{"$map":{"input":"$a","as":"x","in":{"$gt":[{"$strLenCP":"$$x"},5]}}}}}}]""",
      """WITH t0 AS (SELECT doc_id, string_split(text,' ') AS t
                     FROM documents WHERE doc_id<150),
              t AS (SELECT doc_id, t[1:5] AS a, t[3:7] AS b, t[1:2] AS c FROM t0)
         SELECT doc_id,
            to_json(list_sort(list_distinct(a || b)))::VARCHAR AS su,
            to_json(list_sort(list_distinct(list_filter(a, x -> list_contains(b,x)))))::VARCHAR AS si,
            to_json(list_sort(list_distinct(list_filter(a, x -> NOT list_contains(b,x)))))::VARCHAR AS sd,
            len(list_filter(a, x -> NOT list_contains(b,x)))=0
              AND len(list_filter(b, x -> NOT list_contains(a,x)))=0 AS seq,
            len(list_filter(c, x -> NOT list_contains(a,x)))=0 AS sub,
            len(list_filter(a, x -> NOT (length(x)>0)))=0 AS all_t,
            len(list_filter(a, x -> length(x)>5))>0 AS any_t
         FROM t"""),

    // -- type family: $convert/$toInt/$toLong/$toDouble/$toBool/$toString/$type
    Q.pipe("q_expr_type", "orders",
      """[{"$match":{"o_orderkey":{"$lt":2000}}},
          {"$project":{"o_orderkey":1,
            "ti":{"$toInt":{"$divide":["$o_totalprice",1000]}},
            "tl":{"$toLong":"$o_totalprice"},
            "td":{"$toDouble":"$o_orderkey"},
            "ts":{"$toString":"$o_orderkey"},
            "tb":{"$toBool":"$o_orderkey"},
            "cv":{"$convert":{"input":"$o_orderkey","to":"double"}},
            "tp":{"$type":"$o_totalprice"}}}]""",
      """SELECT o_orderkey,
            CAST(trunc(o_totalprice/1000) AS INT) AS ti,
            CAST(trunc(o_totalprice) AS BIGINT) AS tl,
            CAST(o_orderkey AS DOUBLE) AS td,
            CAST(o_orderkey AS VARCHAR) AS ts,
            o_orderkey<>0 AS tb,
            CAST(o_orderkey AS DOUBLE) AS cv,
            'double' AS tp
         FROM orders WHERE o_orderkey<2000"""),

    // -- $let / $literal
    Q.pipe("q_expr_let", "part",
      """[{"$project":{"p_partkey":1,
            "v":{"$let":{"vars":{"t":{"$multiply":["$p_retailprice",2]},"u":10},
                         "in":{"$add":["$$t","$$u"]}}},
            "marker":{"$literal":"$p_name"},
            "arr":{"$jsonToString":{"$literal":[1,2,3]}}}}]""",
      """SELECT p_partkey, p_retailprice*2 + 10 AS v,
                '$p_name' AS marker, to_json([1,2,3])::VARCHAR AS arr
         FROM part"""),

    // -- $mergeObjects + $objectToArray (object family)
    Q.pipe("q_expr_object", "orders",
      """[{"$match":{"o_orderkey":{"$lt":2000}}},
          {"$addFields":{"o1":{"a":1,"b":"$o_orderstatus"},
                         "o2":{"b":"$o_orderpriority","c":2}}},
          {"$addFields":{"m":{"$mergeObjects":["$o1","$o2"]},
                         "kv":{"$objectToArray":{"x":"$o_orderkey","y":"$o_custkey"}}}},
          {"$project":{"o_orderkey":1,"ma":"$m.a","mb":"$m.b","mc":"$m.c",
                       "keys":{"$jsonToString":{"$map":{"input":"$kv","as":"e","in":"$$e.k"}}},
                       "vals":{"$jsonToString":{"$map":{"input":"$kv","as":"e","in":"$$e.v"}}}}}]""",
      """SELECT o_orderkey, 1 AS ma, o_orderpriority AS mb, 2 AS mc,
                to_json(['x','y'])::VARCHAR AS keys,
                to_json([o_orderkey, o_custkey])::VARCHAR AS vals
         FROM orders WHERE o_orderkey<2000"""),

    // -- Mongo cross-type total order (mongo_sort_key / min_by-max_by).
    // Mixed-type JSON values built per row; the oracle reproduces the
    // bracket order with a composite CASE key (bracket digit + an
    // order-preserving within-bracket rendering), and Mongo's
    // ignore-nulls $min/$max via FILTER.
    Q.fn("q_mongo_order",
      """WITH j AS (
           SELECT doc_id % 25 AS g, doc_id % 6 AS m,
             CASE doc_id % 6
               WHEN 0 THEN 'null'
               WHEN 1 THEN CAST(n_chars AS VARCHAR)
               WHEN 2 THEN '"' || lang || '"'
               WHEN 3 THEN '{"a":' || n_chars || '}'
               WHEN 4 THEN '[' || n_chars || ']'
               ELSE CASE WHEN n_chars % 2 = 0 THEN 'true' ELSE 'false' END
             END AS jv,
             CASE doc_id % 6
               WHEN 1 THEN '2' || lpad(CAST(n_chars AS VARCHAR), 12, '0')
               WHEN 2 THEN '3' || lang
               WHEN 3 THEN '4' || lpad(CAST(n_chars AS VARCHAR), 12, '0')
               WHEN 4 THEN '5' || lpad(CAST(n_chars AS VARCHAR), 12, '0')
               ELSE '6' || (CASE WHEN n_chars % 2 = 0 THEN '1' ELSE '0' END)
             END AS k
           FROM documents)
         SELECT CAST(g AS INT) AS g,
                arg_min(jv, k) FILTER (m <> 0) AS lo,
                arg_max(jv, k) FILTER (m <> 0) AS hi
         FROM j GROUP BY g""") { (spark, sfDir) =>
      import org.apache.spark.sql.functions._
      val df = graft.Tables.load(spark, sfDir, "documents")
      val m = col("doc_id") % 6
      val j = when(m === 0, lit("null"))
        .when(m === 1, col("n_chars").cast("string"))
        .when(m === 2, concat(lit("\""), col("lang"), lit("\"")))
        .when(m === 3, concat(lit("{\"a\":"), col("n_chars"), lit("}")))
        .when(m === 4, concat(lit("["), col("n_chars"), lit("]")))
        .otherwise(when(col("n_chars") % 2 === 0, lit("true"))
          .otherwise(lit("false")))
      val k = call_function("mongo_sort_key", j)
      // null bracket ("1") loses both ways: Mongo $min/$max ignore nulls
      val kMin = when(k === "1", lit("\u007f")).otherwise(k)
      val kMax = when(k === "1", lit("")).otherwise(k)
      df.groupBy((col("doc_id") % 25).cast("int").as("g"))
        .agg(min_by(j, kMin).as("lo"), max_by(j, kMax).as("hi"))
    },

    // -- $jes-added/$jes-removed/$jes-changed over JSON-Patch _ops arrays
    // (docs/aggregation_operators.md:1231-1337): the event frame is built
    // deterministically from `events`, the oracle re-derives the predicates
    // with DuckDB list functions over the same constructed _ops list.
    Q.fn("q_jes_changed",
      """WITH e AS (
           SELECT event_id,
             [struct_pack(op := CASE event_type
                 WHEN 'signup' THEN 'add' WHEN 'purchase' THEN 'replace'
                 WHEN 'error' THEN 'remove' ELSE 'test' END,
               path := '/status'),
              struct_pack(op := 'replace', path := '/other')] AS ops,
             event_id % 3 AS bstatus, (event_id + 1) % 3 AS astatus
           FROM events WHERE event_id < 3000)
         SELECT event_id,
           CAST(len(list_filter(ops, o -> o.path = '/status'
             AND o.op IN ('add','replace','remove'))) > 0 AS INT) AS chg,
           CAST(len(list_filter(ops, o -> o.path = '/status'
             AND o.op IN ('add','replace','remove'))) > 0
             AND bstatus = 1 AND astatus = 2 AS INT) AS chg_12,
           CAST(len(list_filter(ops, o -> o.path = '/status'
             AND o.op = 'add')) > 0 AS INT) AS add_st,
           CAST(len(list_filter(ops, o -> o.path = '/status'
             AND o.op = 'remove')) > 0 AS INT) AS rm_st,
           CAST(len(list_filter(ops, o -> o.path = '/other'
             AND o.op IN ('add','replace','remove'))) > 0 AS INT) AS chg_other
         FROM e""") { (spark, sfDir) =>
      import org.apache.spark.sql.functions._
      val ev = graft.Tables.load(spark, sfDir, "events")
        .where(col("event_id") < 3000)
        .withColumn("__op", expr(
          """CASE event_type WHEN 'signup' THEN 'add'
             WHEN 'purchase' THEN 'replace' WHEN 'error' THEN 'remove'
             ELSE 'test' END"""))
        .withColumn("_ops", expr(
          """array(named_struct('op', __op, 'path', '/status'),
                   named_struct('op', 'replace', 'path', '/other'))"""))
        .withColumn("_before", struct((col("event_id") % 3).as("status")))
        .withColumn("_after", struct(((col("event_id") + 1) % 3).as("status")))
      graft.op.Pipeline.run(ev,
        """[{"$addFields":{
             "chg":{"$toInt":{"$jes-changed":{"pointer":"/status"}}},
             "chg_12":{"$toInt":{"$jes-changed":
               {"pointer":"/status","from":1,"to":2}}},
             "add_st":{"$toInt":{"$jes-added":"/status"}},
             "rm_st":{"$toInt":{"$jes-removed":"/status"}},
             "chg_other":{"$toInt":{"$jes-changed":{"pointer":"/other"}}}}},
            {"$project":{"event_id":1,"chg":1,"chg_12":1,"add_st":1,
                         "rm_st":1,"chg_other":1}}]""",
        graft.Tables.env(spark, sfDir))
    }
  )
}
