package graft

/** The ONE JSON string escape for every hand-emitted record (Bench's
  * stdout line, Verify's oracle_sql.json, the value digest). Escapes
  * backslash, quote, and ALL control chars (< 0x20) — one unescaped tab
  * or CR in builder-authored SQL would make the driver's `json.load`
  * fail and silently zero a round's correctness record. Three private
  * copies of this logic once existed; they can no longer diverge.
  */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** One flat string->string JSON object — the durable-marker format the
    * catalog plugin persists (namespace metadata, table descriptors).
    * Real parser both ways: marker values are user-supplied properties.
    */
  def renderStringMap(m: Map[String, String]): String = {
    val node = mapper.createObjectNode()
    m.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    mapper.writeValueAsString(node)
  }

  def parseStringMap(s: String): Map[String, String] = {
    val node = mapper.readTree(s)
    require(node.isObject, s"expected a JSON object, got: $s")
    val it = node.fields()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) {
      val e = it.next()
      require(e.getValue.isTextual,
        s"expected string value for '${e.getKey}' in: $s")
      b += e.getKey -> e.getValue.asText()
    }
    b.result()
  }
}
