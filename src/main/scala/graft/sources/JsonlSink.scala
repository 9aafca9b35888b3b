package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-shard JSON-Lines sink with Beam's shard naming
  * (`{prefix}-00000-of-00001.jsonl`, `/root/reference/src/pipeline.py:292-296`).
  *
  * Rows are serialized with `to_json` over the full row struct with
  * `ignoreNullFields=false`, matching `json.dumps(..., ensure_ascii=False)`
  * (`/root/reference/src/pipeline.py:200`): raw UTF-8, nulls kept. The
  * `coalesce(1)` mirrors `num_shards=1` — a deliberate single-writer
  * collection point, only sane because the reference contract demands one
  * file; the multi-shard path is just `df.write.json(dir)`.
  */
object JsonlSink {

  /** Render one value exactly as Python `json.dumps(v, ensure_ascii=False)`
    * would (`/root/reference/src/pipeline.py:200`): `", "` / `": "`
    * separators (the dumps default without `indent`), raw UTF-8 (only
    * `"`. `\` and control chars escaped, control chars as the named
    * escapes then `\u00XX`), keys in schema field order (= Python dict
    * insertion order). Opt-in byte-exact mode for the golden-parity
    * test; the default `to_json` path stays the production serializer
    * (codegen'd, no row-by-row JVM string building).
    *
    * Floats: the golden corpus carries none at top level (seconds
    * watched is integral); Python float repr (shortest round-trip,
    * `1e-07` style exponents) is NOT reproduced here — integral doubles
    * render `x.0` like Python, which covers every value the reference
    * emits.
    */
  private[graft] def pythonJson(value: Any, dt: DataType): String = (value, dt) match {
    case (null, _) => "null"
    case (b: Boolean, _) => if (b) "true" else "false"
    case (s: String, _) => pythonQuote(s)
    case (r: Row, st: StructType) =>
      st.fields.zipWithIndex.map { case (f, i) =>
        s"${pythonQuote(f.name)}: ${pythonJson(r.get(i), f.dataType)}"
      }.mkString("{", ", ", "}")
    case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
      seq.map(pythonJson(_, et)).mkString("[", ", ", "]")
    case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
      m.map { case (k, v) => s"${pythonQuote(String.valueOf(k))}: ${pythonJson(v, vt)}" }
        .mkString("{", ", ", "}")
    case (d: Double, _) if d.isWhole && !d.isInfinite => s"${d.toLong}.0"
    case (f: Float, _) if f.isWhole && !f.isInfinite => s"${f.toLong}.0"
    case (v, _) => String.valueOf(v)
  }

  private def pythonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** @param pythonStyle reproduce Python `json.dumps` byte layout
    *   (golden-parity mode) instead of Spark's compact `to_json`.
    */
  def write(df: DataFrame, outputDir: String, prefix: String,
            pythonStyle: Boolean = false): String = {
    val tmp = Files.createTempDirectory("graft-jsonl-").toString
    val serialized =
      if (pythonStyle) {
        val schema = df.schema
        df.map(r => pythonJson(r, schema))(Encoders.STRING).toDF("value")
      } else df.select(
        to_json(struct(df.columns.map(c => col(s"`$c`")): _*),
          Map("ignoreNullFields" -> "false")).as("value"))
    serialized.coalesce(1).write.mode("overwrite").text(tmp)

    val part = scala.util.Using.resource(Files.list(Paths.get(tmp)))(
      _.filter(p => p.getFileName.toString.startsWith("part-")).findFirst()
        .orElseThrow(() => new IllegalStateException(s"no part file in $tmp")))
    Files.createDirectories(Paths.get(outputDir))
    val dest = Paths.get(outputDir, s"$prefix-00000-of-00001.jsonl")
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    // best-effort cleanup of the temp dir (walk closed — it holds fds)
    scala.util.Using.resource(Files.walk(Paths.get(tmp)))(
      _.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p)))
    dest.toString
  }
}
