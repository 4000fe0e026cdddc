package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's string-normalization operator family (X1–X7), as pure
  * `Column` expression trees — codegen'd built-ins, no UDFs, so the whole
  * family stays inside whole-stage codegen and is pushdown/prune friendly.
  *
  * Per-source quirks are preserved deliberately (SURVEY.md §7): the
  * pracuj.pl parser normalizes `zł`→`PLN` while the justjoin.it parser does
  * not; only the pracuj.pl path maps pay periods.
  */
object TextOps {

  /** X1 `_clean_position` (reference DataTransform/transform_data.py:37-43):
    * keep a char iff it is ASCII, or Unicode-alphanumeric, or one of
    * ` .,()-`; then trim and collapse runs of 2+ spaces. The char class
    * `[^\x00-\x7F\p{L}\p{N}]` deletes exactly the non-ASCII
    * non-alphanumerics (` .,()-` are ASCII already); Polish letters survive
    * (`ł` ∈ `\p{L}`), `–`/emoji are dropped.
    */
  def cleanPosition(c: Column): Column =
    regexp_replace(
      trim(regexp_replace(c, "[^\\x00-\\x7F\\p{L}\\p{N}]", "")),
      " {2,}", " ")

  /** X2 `_clean_text` (transform_data.py:124-127): NBSP→space, collapse all
    * whitespace runs, trim. Collapse-then-trim is equivalent to the
    * reference's strip-then-collapse for every input.
    */
  def cleanText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, " ", " "), "\\s+", " "))

  /** X3 number extraction (transform_data.py:148-151): all matches of
    * `(\d[\d\s]*(?:,\d+)?)` — digits with embedded space/NBSP thousands
    * separators and optional comma decimals — normalized by stripping
    * spaces and turning the comma into a dot. Returns `array<string>`.
    */
  def extractNumbers(c: Column): Column = {
    val normalized = regexp_replace(c, " ", " ")
    transform(
      regexp_extract_all(normalized, lit("(\\d[\\d\\s]*(?:,\\d+)?)"), lit(1)),
      n => translate(replace(n, lit(" "), lit("")), ",", "."))
  }

  /** X4 currency extraction + pracuj.pl normalization (transform_data.py:
    * 153-158): first case-insensitive match of the currency alternation,
    * with the matched casing preserved, then `zł`→`PLN`.
    */
  def extractCurrency(c: Column): Column = {
    val cur = regexp_extract(c, "(?i)(zł|PLN|EUR|USD|CHF|GBP)", 1)
    when(lower(cur) === "zł", lit("PLN")).otherwise(cur)
  }

  /** X5 pay-period extraction + mapping (transform_data.py:160-165): first
    * case-insensitive match after a `/`, mapped `mies.`→`month`,
    * `godz.`→`h`, everything else passed through.
    */
  def extractPayPeriod(c: Column): Column = {
    val p = regexp_extract(c, "(?i)/\\s*(mies\\.|godz\\.|rok|dzień|tydzień|h)", 1)
    when(p === "mies.", lit("month"))
      .when(p === "godz.", lit("h"))
      .otherwise(p)
  }

  /** X6 min/max fan-out (transform_data.py:167-173) over an extracted
    * number array: ≥2 numbers → (n0, n1); 1 → (n0, n0); 0 → ("", "").
    */
  def minimumOf(nums: Column): Column =
    when(size(nums) >= 1, element_at(nums, 1)).otherwise(lit(""))

  def maximumOf(nums: Column): Column =
    when(size(nums) >= 2, element_at(nums, 2))
      .when(size(nums) === 1, element_at(nums, 1))
      .otherwise(lit(""))

  /** X2–X6 composed: the full pracuj.pl salary-parse pipeline
    * (transform_data.py:129-180), text → struct(minimum, maximum,
    * currency, pay_period), all strings with empty-string missing values
    * (the reference's convention).
    */
  def parseSalary(c: Column): Column = {
    val t = regexp_replace(regexp_replace(c, " ", " "), " ", " ")
    val nums = extractNumbers(t)
    struct(
      minimumOf(nums).as("minimum"),
      maximumOf(nums).as("maximum"),
      extractCurrency(t).as("currency"),
      extractPayPeriod(t).as("pay_period"))
  }

  /** X8 header offer-count parse, pracuj.pl quirk
    * (DataExtract/extract_data.py:53-62): the FIRST plain digit run —
    * `re.findall(r"\d+", text)[0]` — so a space/NBSP-grouped header like
    * "4 022 ofert" parses as 4 (the reference's behavior, preserved).
    * Returns bigint; null when the header has no digits (the reference
    * raises ValueError there — absence-of-value, not a crash, is the
    * engine-shaped form).
    */
  def offerCountPpl(c: Column): Column =
    nullif(regexp_extract(c, "(\\d+)", 1), lit("")).cast("long")

  /** X8 header offer-count parse, justjoin.it quirk
    * (extract_data.py:168-174): NBSP → space first, then the LAST match
    * of `\d[\d\s]*` with its internal spaces stripped —
    * `re.findall(...)[-1].replace(" ", "")` — so "10 of 3 029 offers"
    * parses as 3029. Returns bigint; null when no digits.
    */
  def offerCountJjit(c: Column): Column = {
    val runs = regexp_extract_all(
      regexp_replace(c, " ", " "), lit("(\\d[\\d\\s]*)"), lit(1))
    when(size(runs) >= 1,
      regexp_replace(element_at(runs, -1), "\\s", "").cast("long"))
  }

  /** X8 with the P3 site dispatch: per-site first-vs-last-match branch,
    * as one expression (extract_data.py routes via the scraper subclass;
    * here the site string is data, so one plan serves both).
    */
  def offerCount(site: Column, c: Column): Column =
    when(site === "pracujplit", offerCountPpl(c))
      .when(site === "justjoinit", offerCountJjit(c))

  /** X7 justjoin.it span-based salary parse (transform_data.py:46-84) over
    * an `array<string>` of span texts: 2 spans → min=max=s0 and s1 splits
    * into currency/period; ≥3 spans → (s0, s1, split s2); otherwise all
    * empty. A span splits on `/` only when it contains exactly one `/`
    * (the reference's tuple-unpack raises otherwise); numbers get their
    * spaces stripped; `zł` is NOT normalized (per-source quirk).
    */
  def parseSalarySpans(spans: Column): Column = {
    def stripSpaces(c: Column): Column = replace(c, lit(" "), lit(""))
    def splitCur(c: Column): Column = {
      val parts = split(c, "/", -1)
      when(size(parts) === 2, struct(
        element_at(parts, 1).as("currency"),
        element_at(parts, 2).as("pay_period")))
        .otherwise(struct(c.as("currency"), lit("").as("pay_period")))
    }
    val n = size(spans)
    val two = splitCur(element_at(spans, 2))
    val three = splitCur(element_at(spans, 3))
    when(n === 2, struct(
      stripSpaces(element_at(spans, 1)).as("minimum"),
      stripSpaces(element_at(spans, 1)).as("maximum"),
      two.getField("currency").as("currency"),
      two.getField("pay_period").as("pay_period")))
      .when(n >= 3, struct(
        stripSpaces(element_at(spans, 1)).as("minimum"),
        stripSpaces(element_at(spans, 2)).as("maximum"),
        three.getField("currency").as("currency"),
        three.getField("pay_period").as("pay_period")))
      .otherwise(struct(
        lit("").as("minimum"), lit("").as("maximum"),
        lit("").as("currency"), lit("").as("pay_period")))
  }
}
