package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  def write(df: DataFrame, outputDir: String, prefix: String): String = {
    val tmp = Files.createTempDirectory("graft-jsonl-").toString
    val serialized = df.select(
      to_json(struct(df.columns.map(c => col(s"`$c`")): _*),
        Map("ignoreNullFields" -> "false")).as("value"))
    serialized.coalesce(1).write.mode("overwrite").text(tmp)

    val part = Files.list(Paths.get(tmp)).filter(p =>
      p.getFileName.toString.startsWith("part-")).findFirst()
      .orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
    Files.createDirectories(Paths.get(outputDir))
    val dest = Paths.get(outputDir, s"$prefix-00000-of-00001.jsonl")
    Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
    // best-effort cleanup of the temp dir
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    dest.toString
  }
}
