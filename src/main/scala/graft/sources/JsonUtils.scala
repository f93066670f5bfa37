package graft.sources

import com.fasterxml.jackson.core.JsonParser
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** JSON config read/write with strict duplicate-key detection.
  *
  * Capability parity with the reference's JSON utilities
  * (reference: `src/hds_functions/json_utils.py:10-99`). Uses the Jackson
  * shipped inside Spark's jars — no extra dependency.
  */
object JsonUtils {

  private def mapper: ObjectMapper = {
    val m = new ObjectMapper()
    // Reference rejects duplicate keys via object_pairs_hook
    // (json_utils.py:32-52); Jackson has the equivalent built in.
    m.enable(JsonParser.Feature.STRICT_DUPLICATE_DETECTION)
    m
  }

  /** Read a JSON object file into a Scala Map. Duplicate keys raise
    * IllegalArgumentException, mirroring the reference's ValueError. */
  def readJsonFile(path: String): Map[String, Any] = {
    val text = Files.readString(Paths.get(path))
    val node =
      try mapper.readTree(text)
      catch {
        case e: com.fasterxml.jackson.core.JsonParseException
            if e.getMessage != null && e.getMessage.contains("Duplicate field") =>
          throw new IllegalArgumentException(
            s"JSON file '$path' contains duplicate key", e
          )
      }
    require(node != null && node.isObject, s"JSON file '$path' must contain an object")
    fromNode(node).asInstanceOf[Map[String, Any]]
  }

  private def fromNode(node: JsonNode): Any =
    if (node.isObject)
      node.properties().asScala.map(e => e.getKey -> fromNode(e.getValue)).toMap
    else if (node.isArray) node.elements().asScala.map(fromNode).toList
    else if (node.isTextual) node.asText()
    else if (node.isIntegralNumber) node.asLong()
    else if (node.isNumber) node.asDouble()
    else if (node.isBoolean) node.asBoolean()
    else if (node.isNull) null
    else node.asText()

  /** Write a value as indented JSON. Parent directory must exist, mirroring
    * the reference's guard (json_utils.py:93-96). */
  def writeJsonFile(data: Any, path: String, indent: Int = 4): Unit = {
    val p = Paths.get(path)
    val dir = p.toAbsolutePath.getParent
    require(
      dir != null && Files.exists(dir),
      s"Directory '$dir' does not exist."
    )
    Files.writeString(p, render(data, indent, 0))
  }

  private def render(v: Any, indent: Int, depth: Int): String = {
    val pad = " " * (indent * (depth + 1))
    val padEnd = " " * (indent * depth)
    v match {
      case null       => "null"
      case s: String  => quote(s)
      case b: Boolean => b.toString
      case i: Int     => i.toString
      case l: Long    => l.toString
      case d: Double  =>
        // Locale.ROOT: f"$d%.1f" would use the JVM default locale and emit
        // "1,0" (invalid JSON) on comma-decimal locales. Whole doubles too
        // large for the %.1f path (|d| >= 1e16, where floor equality stops
        // being meaningful) fall through to scientific notation.
        if (d == d.floor && !d.isInfinite && math.abs(d) < 1e16)
          String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
        else d.toString
      case m: Map[_, _] =>
        if (m.isEmpty) "{}"
        else
          m.map { case (k, value) =>
            s"$pad${quote(k.toString)}: ${render(value, indent, depth + 1)}"
          }.mkString("{\n", ",\n", s"\n$padEnd}")
      case s: Iterable[_] =>
        if (s.isEmpty) "[]"
        else
          s.map(e => s"$pad${render(e, indent, depth + 1)}")
            .mkString("[\n", ",\n", s"\n$padEnd]")
      case other => quote(other.toString)
    }
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}
