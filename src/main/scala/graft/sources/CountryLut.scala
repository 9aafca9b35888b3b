package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One country row of the side input, in output-payload shape.
  * Field five is genuinely named "official language" (with a space) in the
  * reference's output schema (`/root/reference/src/pipeline.py:114-120`);
  * the case class uses a Scala-legal name and the DataFrame renames it.
  */
case class CountryRow(
    keyNorm: String,
    country: String,
    capital: String,
    continent: String,
    officialLanguage: String,
    currency: String)

/** Country-CSV side-input loader with the reference's robustness semantics
  * (`/root/reference/src/pipeline.py:56-130`):
  *
  *   - delimiter sniffed from `;`, `,`, `|`, tab over the first 4 KiB;
  *   - UTF-8 BOM tolerated;
  *   - fuzzy header matching: headers normalized by lowercasing and
  *     stripping `[\s_-]+`, then matched against per-field alias candidate
  *     lists; first non-empty candidate value wins;
  *   - rows with no country value are skipped; duplicate countries: last
  *     row wins;
  *   - after the build, alias keys (`usa`/`us`/`u.s.` → `united states`,
  *     `uk` → `united kingdom`, `uae` → `united arab emirates`) are added
  *     ONLY if the canonical long name is already a key
  *     (`/root/reference/src/pipeline.py:125-128`). With the reference CSV —
  *     which names those countries literally `UK`/`USA` — the aliases do
  *     NOT fire, so `UK`/`USA` probes miss and fall back. Load-bearing
  *     quirk; pinned by a regression test.
  *
  * The LUT is tiny by contract (tens of rows), so it is parsed on the
  * driver. The scale path is [[CountryLut.df]]: a DataFrame build side for
  * a broadcast hash join — no driver-side lookup happens per event row.
  */
object CountryLut {

  val Alias: Map[String, String] = Map(
    "usa" -> "united states",
    "us" -> "united states",
    "u.s." -> "united states",
    "uk" -> "united kingdom",
    "uae" -> "united arab emirates")

  private val FieldAliases: Map[String, Seq[String]] = Map(
    "country" -> Seq("Country", "Country Name", "Country_Name", "CountryName", "Name"),
    "capital" -> Seq("Capital", "Capital City", "Capital_City", "CapitalCity"),
    "continent" -> Seq("Continent", "Continent Name", "Region", "Subregion"),
    "official language" -> Seq(
      "Main Official Language", "Main_Official_Language",
      "Official Language", "Official_Language", "Language", "Languages"),
    "currency" -> Seq(
      "Currency", "Currency Code", "Currency_Code",
      "Currency Name", "Currency_Name", "CurrencyName", "ISO Currency"))

  def normKey(name: String): String =
    Option(name).getOrElse("").strip().toLowerCase

  private def normHeader(h: String): String =
    Option(h).getOrElse("").strip().toLowerCase.replaceAll("[\\s_\\-]+", "")

  /** Pick the delimiter whose count in the first non-empty line (outside
    * quotes) is highest, among `; , | \t` — a simplified csv.Sniffer.
    */
  def sniffDelimiter(sample: String): Char = {
    val firstLine = sample.linesIterator.find(_.nonEmpty).getOrElse("")
    val counts = Seq(';', ',', '|', '\t').map { d =>
      var n = 0; var inQ = false
      firstLine.foreach { c =>
        if (c == '"') inQ = !inQ else if (c == d && !inQ) n += 1
      }
      d -> n
    }
    val (best, n) = counts.maxBy(_._2)
    if (n == 0) ',' else best
  }

  /** Minimal RFC-4180-ish line splitter (quoted fields, doubled quotes). */
  private[sources] def splitCsvLine(line: String, delim: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
          else inQ = false
        } else cur += c
      } else {
        if (c == '"') inQ = true
        else if (c == delim) { out += cur.result(); cur.clear() }
        else cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  /** Build the keyed LUT (driver-side; inputs are contractually tiny). */
  def build(csvPath: String): Map[String, CountryRow] = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(csvPath))
    var text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    if (text.nonEmpty && text.charAt(0) == '\uFEFF') text = text.substring(1)
    val delim = sniffDelimiter(text.take(4096))
    val lines = text.linesIterator.filter(_.nonEmpty).toVector
    if (lines.isEmpty) return Map.empty

    val headers = splitCsvLine(lines.head, delim)
    // last header wins on normalized collisions, like Python's dict build
    val headerNormToIdx: Map[String, Int] =
      headers.zipWithIndex.map { case (h, i) => normHeader(h) -> i }.toMap

    def getValue(cells: Vector[String], candidates: Seq[String]): String = {
      candidates.iterator.flatMap { cand =>
        headerNormToIdx.get(normHeader(cand)).flatMap { idx =>
          if (idx < cells.length) {
            val v = cells(idx).strip()
            if (v.nonEmpty) Some(v) else None
          } else None
        }
      }.nextOption().getOrElse("")
    }

    var lut = scala.collection.immutable.ListMap.empty[String, CountryRow]
    lines.tail.foreach { line =>
      val cells = splitCsvLine(line, delim)
      val country = getValue(cells, FieldAliases("country"))
      if (country.nonEmpty) {
        val row = CountryRow(
          keyNorm = normKey(country),
          country = country,
          capital = getValue(cells, FieldAliases("capital")),
          continent = getValue(cells, FieldAliases("continent")),
          officialLanguage = getValue(cells, FieldAliases("official language")),
          currency = getValue(cells, FieldAliases("currency")))
        lut = lut.updated(row.keyNorm, row)
      }
    }
    // Alias keys only when the canonical country is present (the quirk).
    Alias.foreach { case (alias, canonical) =>
      lut.get(canonical).foreach { row => lut = lut.updated(alias, row.copy(keyNorm = alias)) }
    }
    lut
  }

  /** Build-side DataFrame for the broadcast join: one row per LUT key
    * (including fired alias keys), columns `key_norm` + the 5 payload
    * fields. This is the 100 TB path — the probe side never leaves the
    * executors; only this tiny build side is broadcast.
    */
  def df(spark: SparkSession, csvPath: String): DataFrame = {
    import spark.implicits._
    build(csvPath).values.toSeq.toDF(
      "key_norm", "country", "capital", "continent", "official_language", "currency")
  }
}
