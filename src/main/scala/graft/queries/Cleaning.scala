package graft.queries

import graft.{GraftQuery, Tables}
import graft.functions.Cleaning._
import org.apache.spark.sql.functions._

/** Oracle-checked exercises of the E1–E18 cleaning expressions
  * (SURVEY §2.8) over the driver fixtures. Input strings (phones,
  * addresses, price strings) are synthesized deterministically from
  * table columns with the SAME formula in the DuckDB oracle, so both
  * engines clean identical inputs.
  */
object Cleaning {

  /** E1 + E18: phone normalization over three synthesized shapes —
    * formatted 10-digit, 11-digit with leading 1, malformed short. */
  val qCleanPhone = GraftQuery(
    "q_clean_phone",
    (s, d) => {
      import s.implicits._
      val digits = lpad((($"c_custkey" * 7919 + 123456789L) % 10000000000L)
        .cast("string"), 10, "0")
      val raw = when($"c_custkey" % 3 === 0,
          concat(lit("("), substring(digits, 1, 3), lit(") "),
                 substring(digits, 4, 3), lit("-"), substring(digits, 7, 4)))
        .when($"c_custkey" % 3 === 1, concat(lit("1"), digits))
        .otherwise(substring(digits, 1, 7))
      Tables.customer(s, d)
        .select($"c_custkey", raw.as("raw_phone"),
                normalizePhone(raw).as("phone"))
    },
    Some("""
      WITH t AS (
        SELECT c_custkey,
          lpad(CAST((c_custkey * 7919 + 123456789) % 10000000000 AS VARCHAR), 10, '0') AS digits
        FROM customer),
      r AS (
        SELECT c_custkey,
          CASE CAST(c_custkey % 3 AS INT)
            WHEN 0 THEN '(' || substr(digits,1,3) || ') ' || substr(digits,4,3) || '-' || substr(digits,7,4)
            WHEN 1 THEN '1' || digits
            ELSE substr(digits,1,7) END AS raw_phone
        FROM t)
      SELECT c_custkey, raw_phone,
        CASE
          WHEN length(regexp_replace(raw_phone, '[^0-9]', '', 'g')) = 10
            THEN '+1' || regexp_replace(raw_phone, '[^0-9]', '', 'g')
          WHEN length(regexp_replace(raw_phone, '[^0-9]', '', 'g')) = 11
               AND regexp_replace(raw_phone, '[^0-9]', '', 'g') LIKE '1%'
            THEN '+' || regexp_replace(raw_phone, '[^0-9]', '', 'g')
          ELSE raw_phone END AS phone
      FROM r"""))

  /** E2 initcap + E5 name split + E12 tag transform + E17 cleanup. */
  val qCleanStrings = GraftQuery(
    "q_clean_strings",
    (s, d) => {
      import s.implicits._
      val messy = concat(lit("  "), upper($"p_name"), lit("  extra  part"))
      Tables.part(s, d).select(
        $"p_partkey",
        capitalizeWords($"p_name").as("name_cap"),
        firstName($"p_name").as("first_word"),
        lastName($"p_name").as("rest_words"),
        cleanWhitespace(messy).as("cleaned"),
        tagList(concat($"p_brand", lit(","), $"p_type"), " Market").as("tags"))
    },
    Some("""
      SELECT p_partkey,
        array_to_string(list_transform(string_split(p_name, ' '),
          w -> upper(w[1]) || lower(w[2:])), ' ') AS name_cap,
        string_split(p_name, ' ')[1] AS first_word,
        array_to_string(string_split(p_name, ' ')[2:], ' ') AS rest_words,
        trim(replace('  ' || upper(p_name) || '  extra  part', '  ', ' ')) AS cleaned,
        array_to_string(list_transform(string_split(p_brand || ',' || p_type, ','),
          c -> trim(c) || ' Market'), ', ') AS tags
      FROM part"""))

  /** E4 address decompose + E14 templating round-trip. */
  val qCleanAddress = GraftQuery(
    "q_clean_address",
    (s, d) => {
      import s.implicits._
      val addr = concat($"c_name", lit(", Provo, UT "),
        lpad(((lit(84000) + $"c_custkey" % 1000)).cast("string"), 5, "0"))
      Tables.customer(s, d).select(
        $"c_custkey",
        addr.as("address"),
        addressCity(addr).as("city"),
        addressState(addr).as("state"),
        addressZip(addr).as("zip"))
    },
    Some("""
      WITH a AS (
        SELECT c_custkey,
          c_name || ', Provo, UT ' || lpad(CAST(84000 + c_custkey % 1000 AS VARCHAR), 5, '0') AS address
        FROM customer)
      SELECT c_custkey, address,
        string_split(address, ', ')[2] AS city,
        string_split(string_split(address, ', ')[3], ' ')[1] AS state,
        right(address, 5) AS zip
      FROM a"""))

  /** E3 price-string parse round-trip + E7 guarded division + E8
    * try_cast with sentinel default. */
  val qCleanNumeric = GraftQuery(
    "q_clean_numeric",
    (s, d) => {
      import s.implicits._
      val whole = floor($"o_totalprice").cast("long")
      val priceStr = concat(lit("$"), format_number(whole, 0))
      Tables.orders(s, d).select(
        $"o_orderkey",
        priceStr.as("price_str"),
        parsePrice(priceStr).as("price_parsed"),
        guardedDiv($"o_totalprice", ($"o_orderkey" % 5).cast("double")).as("guarded_ratio"),
        coalesce(substring($"o_orderstatus", 1, 1).try_cast("double"), lit(0.0)).as("bad_cast_default"))
    },
    Some("""
      WITH t AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
          '$' || format('{:,}', CAST(floor(o_totalprice) AS BIGINT)) AS price_str
        FROM orders)
      SELECT o_orderkey, price_str,
        COALESCE(TRY_CAST(regexp_replace(price_str, '[$,]', '', 'g') AS BIGINT), 0) AS price_parsed,
        CASE WHEN CAST(o_orderkey % 5 AS DOUBLE) <> 0
             THEN o_totalprice / CAST(o_orderkey % 5 AS DOUBLE)
             ELSE 0.0 END AS guarded_ratio,
        COALESCE(TRY_CAST(substr(o_orderstatus, 1, 1) AS DOUBLE), 0.0) AS bad_cast_default
      FROM t"""))

  /** E9 price-change pct + E11 whole-day difference (order → ship). */
  val qCleanDates = GraftQuery(
    "q_clean_dates",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .select(
          $"l_orderkey", $"l_linenumber",
          daysBetween($"l_shipdate", $"o_orderdate").as("days_to_ship"),
          round(priceChangePct($"l_extendedprice", $"o_totalprice"), 6).as("price_delta_pct"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS INT) AS days_to_ship,
        round((l_extendedprice - o_totalprice) / o_totalprice * 100, 6) AS price_delta_pct
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""))

  /** PII scrubbing + quasi-identifier generalization — the privacy
    * pass a training-data pipeline runs before release: digit runs
    * (ids, account numbers) redacted to a `<NUM>` sentinel with an
    * audit count per row, and the numeric quasi-identifier (account
    * balance) generalized to a 1000-wide band (k-anonymity style).
    * Pure row expressions — map-only at any scale; the audit counts
    * roll up into release-gate metrics downstream. */
  val qPiiScrub = GraftQuery(
    "q_pii_scrub",
    (s, d) => {
      import s.implicits._
      val name = $"c_name"
      Tables.customer(s, d).select(
        $"c_custkey",
        regexp_replace(name, "\\d{3,}", "<NUM>").as("masked_name"),
        size(regexp_extract_all(name, lit("\\d{3,}"), lit(0))).as("n_digit_runs"),
        (length(name) - length(regexp_replace(name, "\\d", "")))
          .as("n_digits_redacted"),
        (floor($"c_acctbal" / 1000) * 1000).cast("long").as("acctbal_band"))
    },
    Some("""
      SELECT c_custkey,
        regexp_replace(c_name, '\d{3,}', '<NUM>', 'g') AS masked_name,
        CAST(length(regexp_extract_all(c_name, '\d{3,}')) AS INT) AS n_digit_runs,
        CAST(length(c_name) - length(regexp_replace(c_name, '\d', '', 'g')) AS INT)
          AS n_digits_redacted,
        CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band
      FROM customer"""))

  val all: Seq[GraftQuery] = Seq(
    qCleanPhone, qCleanStrings, qCleanAddress, qCleanNumeric, qCleanDates,
    qPiiScrub)
}
