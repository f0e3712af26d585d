package graft.etl

import java.nio.file.{Files, Paths}

/** Driver-side run-summary JSON artifacts (ref: per-run summary writers,
  * src/mf_etl/bronze/pipeline.py:70-81,366-426 and ~20 clones). Plain JVM
  * file IO — these are tiny sidecars, not Dataset ops. */
object RunArtifacts {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def render(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + esc(s) + "\""
    case b: Boolean => b.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case d: Double =>
      if (d.isNaN || d.isInfinite) "null" else d.toString
    case m: Map[_, _] =>
      m.map { case (k, x) => "\"" + esc(k.toString) + "\": " + render(x) }
        .mkString("{", ", ", "}")
    case xs: Seq[_] => xs.map(render).mkString("[", ", ", "]")
    case other => "\"" + esc(other.toString) + "\""
  }

  /** Atomic JSON write: tmp file + move (ref: tmp + os.replace atomic
    * visibility, src/mf_etl/bronze/writer.py:60-83). */
  def writeJson(path: String, payload: Map[String, Any]): Unit =
    writeText(path, render(payload))

  /** One rendered JSON object (for JSON-lines artifacts readable back
    * as a DataFrame via spark.read.json). */
  def writeJsonLine(payload: Map[String, Any]): String = render(payload)

  /** Atomic text write (same tmp + move discipline). */
  def writeText(path: String, content: String): Unit = {
    val target = Paths.get(path)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** RFC-4180 CSV field quoting (commas/quotes/newlines in a field must
    * not corrupt the row). */
  def csvLine(fields: Seq[Any]): String =
    fields.map { f =>
      val s = if (f == null) "" else String.valueOf(f)
      if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }.mkString(",")

  /** Atomic CSV write with a header row. */
  def writeCsv(path: String, header: Seq[String],
      rows: Seq[Seq[Any]]): Unit =
    writeText(path,
      (csvLine(header) +: rows.map(csvLine)).mkString("", "\n", "\n"))
}
