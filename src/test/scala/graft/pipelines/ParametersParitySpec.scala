package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite

/** Machine check of the public-API contract (verdict r12 item 3):
  * `docs/PARAMETERS.md` claims a graft mapping for every template
  * parameter of the reference (the `*_metadata` JSON files under
  * `/root/reference/metadata` — the reference's own machine-readable
  * parameter declarations, e.g. `SpannerToText_metadata`). This spec
  * files and asserts the claim the way GateInventorySpec locks SURVEY
  * §8.10: every template name must head a `## <Name>` section, and
  * every parameter name must appear verbatim inside its template's
  * section (as a whole word — `table` must not be satisfied by
  * `--outputTable`). A parameter the library deliberately does not
  * carry must be listed with `waived:` and a reason, which this spec
  * also accepts — silence is the only failure mode. */
class ParametersParitySpec extends AnyFunSuite {

  private val metadataDir = new java.io.File("/root/reference/metadata")
  private val doc = {
    val p = java.nio.file.Paths.get("docs/PARAMETERS.md")
    new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** section name -> section body (from its `## ` header to the next) */
  private val sections: Map[String, String] =
    doc.split("\n(?=## )").toSeq.flatMap { s =>
      val lines = s.linesIterator.toSeq
      lines.headOption.filter(_.startsWith("## ")).map { h =>
        // "## SpannerToText → `query-to-text`" -> "SpannerToText"
        h.stripPrefix("## ").split("\\s").head -> s
      }
    }.toMap

  private def templates: Seq[(String, Seq[String])] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val files = Option(metadataDir.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith("_metadata")).sortBy(_.getName).toSeq
    assert(files.size >= 11, s"expected the reference's 11 template " +
      s"metadata files under $metadataDir, found ${files.size}")
    files.map { f =>
      val root = mapper.readTree(f)
      val name = root.path("name").asText("")
      assert(name.nonEmpty, s"${f.getName}: no template name")
      val ps = root.path("parameters")
      assert(ps.isArray && ps.size() > 0, s"$name: no parameters array")
      val names = (0 until ps.size()).map(i => ps.get(i).path("name").asText(""))
      assert(names.forall(_.nonEmpty), s"$name: unnamed parameter entry")
      (name, names)
    }
  }

  private def wordPresent(body: String, word: String): Boolean =
    java.util.regex.Pattern
      .compile("\\b" + java.util.regex.Pattern.quote(word) + "\\b")
      .matcher(body).find()

  test("every reference template has a PARAMETERS.md section") {
    val missing = templates.map(_._1).filterNot(sections.contains)
    assert(missing.isEmpty,
      s"templates with no '## <Name>' section in docs/PARAMETERS.md: $missing")
  }

  test("every template parameter is mapped (or explicitly waived) in its section") {
    // a parameter only counts as MAPPED when it appears on a mapping-claim
    // line — a table row (`| ... |`) or a prose mapping (`a → b`) — so an
    // incidental prose mention ("unlike timestampBound, ...") cannot
    // satisfy the gate; an explicit `waived: <name>` anywhere in the
    // section is the other accepted form (checked FIRST — it is not
    // implied by the mapping check)
    val problems = for {
      (tmpl, params) <- templates
      body <- sections.get(tmpl).toSeq
      // header lines also contain '→' ("## Name → `cli-name`") — exclude
      // them, or a parameter named like a CLI-alias word would count as
      // mapped with no mapping row
      claims = body.linesIterator
        .filter(l => !l.startsWith("#") &&
          (l.trim.startsWith("|") || l.contains("→")))
        .mkString("\n")
      p <- params
      if !wordPresent(body, s"waived: $p") && !wordPresent(claims, p)
    } yield s"$tmpl.$p"
    assert(problems.isEmpty,
      "unmapped parameters (add a mapping-table row / '→' prose mapping or " +
        s"a 'waived: <name> — reason' line to docs/PARAMETERS.md): ${problems.mkString(", ")}")
  }

  test("sections do not claim templates the reference does not declare") {
    // the preamble section ("Reference template parameters") is not a
    // template; every other `## ` header must match a metadata name
    val declared = templates.map(_._1).toSet
    val stray = sections.keys.filterNot(declared.contains).toSeq
    assert(stray.isEmpty, s"PARAMETERS.md sections with no metadata file: $stray")
  }
}
