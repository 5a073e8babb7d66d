package graft.tools

/** One-off resource maintenance (round 16, VERDICT r15 stretch #9):
  * shed the PSL resource's Unicode-spelled IDN rules. Since round 15
  * every probed host IDNA-normalizes to punycode BEFORE the rule probe
  * ([[graft.functions.PslSuffixImpl.toAsciiHost]]), so the Unicode
  * spellings are unreachable dead weight — PROVIDED each has its
  * punycode twin in the set. This tool verifies exactly that with the
  * SAME `java.net.IDN.toASCII` call the runtime uses (never a second
  * IDNA implementation to disagree), then rewrites the resource with
  * the Unicode lines dropped. Refuses to write if any twin is missing. */
object SlimPsl {
  def main(args: Array[String]): Unit = {
    val path = java.nio.file.Paths.get(args.headOption.getOrElse(
      "src/main/resources/graft/psl_icann.txt"))
    val lines = java.nio.file.Files.readAllLines(path,
      java.nio.charset.StandardCharsets.UTF_8)
    import scala.jdk.CollectionConverters._
    val all = lines.asScala.toSeq
    val rules = all.filterNot(l => l.isEmpty || l.startsWith("#")).toSet
    def ascii(s: String) = s.forall(_ < 128)
    val unicode = rules.filterNot(ascii)
    val missing = unicode.filter { u =>
      val bare = u.stripPrefix("!").stripPrefix("*.")
      val prefix = u.substring(0, u.length - bare.length)
      try {
        val twin = prefix + java.net.IDN.toASCII(bare,
          java.net.IDN.ALLOW_UNASSIGNED).toLowerCase(java.util.Locale.ROOT)
        !rules.contains(twin)
      } catch {
        // a rule IDN itself cannot convert: a host carrying it would
        // also fail normalization and keep its Unicode spelling, so the
        // Unicode rule IS reachable — it must stay
        case _: IllegalArgumentException => true
      }
    }
    require(missing.isEmpty,
      s"refusing to slim: ${missing.size} Unicode rules lack a punycode " +
        s"twin: ${missing.take(5).mkString(", ")}")
    val kept = all.filter(l =>
      l.isEmpty || l.startsWith("#") || ascii(l))
    java.nio.file.Files.write(path,
      kept.mkString("", "\n", "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    println(s"[slim-psl] dropped ${unicode.size} Unicode-spelled rules; " +
      s"${kept.count(l => l.nonEmpty && !l.startsWith("#"))} rules remain")
  }
}
