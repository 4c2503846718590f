package graft

/** Static audit of oracle SQL for the division construct that produced
  * the round-10 driver-oracle breach: an integer `//` whose operand can
  * go NEGATIVE.
  *
  * DuckDB versions disagree on negative integer `//`: 1.0.0 truncates
  * toward zero (matching Spark `div`), newer engines floor — so an
  * oracle that divides a possibly-negative value is correct on one
  * DuckDB version and wrong on another, invisible to any single-version
  * local verify. The FIXTURES.md negative-// rule: only provably
  * non-negative operands may cross `//` / `div`; signs are carried
  * separately (`sign(x) * (abs(x) // den)` — identical under floor AND
  * truncate semantics).
  *
  * Mechanics: every `//` site's MINIMAL operands are extracted with
  * `*`-precedence (numerator = the maximal chain of `*`/`%`-connected
  * primaries scanning backwards — an additive `+`/`-` terminates it;
  * denominator = the single primary after). An operand offends when,
  * outside `abs(...)`/`sign(...)` wrappers, it contains an inline
  * subtraction or an alias whose defining line carries one (propagated
  * alias→alias to fixpoint). Both operands are checked: floor-vs-
  * truncate diverges on negative divisors too.
  *
  * Sites that are provably non-negative DESPITE a syntactic subtraction
  * (prefix-sum differences, `row_number() - 1`, ceil-division idioms,
  * Cauchy–Schwarz variance terms) are declared in [[allow]] with a
  * one-line proof; the audit fails on any NEW undeclared site. Limit
  * (by design): a negative SOURCE column with no subtraction anywhere
  * is invisible statically — that class is covered by the
  * floor-semantics replay (`scripts/check_division_portability.py`,
  * run by verify_local.sh).
  */
object OracleAudit {

  /** (query-name prefix, operand pattern) → proof of non-negativity.
    * A violation is accepted iff some entry's prefix matches the query
    * and its pattern matches the OFFENDING OPERAND (whitespace-
    * collapsed): exact equality always, containment only for patterns
    * of length >= 4 (so a one-letter alias can't wave through unrelated
    * sites). Scoping allow to the offending operand — never the whole
    * site — is what keeps `den` (a justified denominator) from
    * whitelisting a signed NUMERATOR divided by den, i.e. the exact
    * r10 breach shape. */
  val allow: Seq[(String, String, String)] = Seq(
    ("", "(pos - 1)",
      "token positions are 1-based: pos - 1 >= 0"),
    ("", "(2 * n_p - 2 * df + 1)",
      "BM25 IDF factor: df <= n_p by construction (df counts passages containing the term), so 2*n_p - 2*df + 1 >= 1; every other factor in the operand is a product of counts"),
    ("", "(cum - n_tok)",
      "cum is the running sum INCLUDING n_tok: cum - n_tok >= 0 (prefix-sum packing idiom)"),
    ("graph_triangles", "d * (d - 1)",
      "degrees d >= 1, so d*(d-1) >= 0 (C(d,2) wedge count)"),
    ("graph_triangles", "n_wedges",
      "n_wedges is a sum of C(d,2) >= 0 terms"),
    ("lake_skipping", "ln) - 1)",
      "row_number() >= 1, so rn - 1 >= 0 (0-based file index)"),
    ("dedup_jaccard_prefix", "+ 5 - 1)",
      "ceil-division idiom (a + b - 1) // b with a >= 0, b >= 1"),
    ("dedup_jaccard_prefix", "(na + nb - i)",
      "i <= min(na, nb), so the union size na + nb - i >= max(na, nb) >= 1"),
    ("dedup_chunk_stats", "dup_bytes, 0) * 1000000",
      "dup_bytes is a sum of CDC chunk lengths (cut-position differences, each >= 0)"),
    ("dedup_chunk_stats", "greatest(tot.n_bytes, 1)",
      "n_bytes is a sum of chunk lengths >= 0; greatest(.., 1) bounds the divisor >= 1"),
    ("", "22 * tf * l_tot",
      "BM25 numerator: tf (term frequency) and l_tot (corpus token count) are counts >= 0"),
    ("", "(2 * df + 1)",
      "df is a document-frequency count >= 0, so 2*df + 1 >= 1"),
    ("", "(10 * l_tot * tf + 3 * l_tot + 9 * plen * n_p)",
      "BM25 denominator: l_tot/tf/plen/n_p are all counts >= 0; the l_tot term makes it >= 1 on any nonempty corpus"),
    ("text_collocations", "c_xy *",
      "c_xy is the bigram co-occurrence count(*) — the subtraction in its lineage is position pairing, the count is >= 0"),
    ("join_bloom", "p",
      "bit position p = (md5-derived nonneg hash) % m, >= 0"),
    ("join_bloom", "op.p",
      "bit position p = (md5-derived nonneg hash) % m, >= 0"),
    ("multimodal_features", "y * 2",
      "y/x are generate_series(0, h-1) pixel indices >= 0"),
    ("multimodal_features", "x * 2",
      "y/x are generate_series(0, h-1) pixel indices >= 0"),
    ("multimodal_audio", "i * 4",
      "i is a generate_series(0, ns-1) sample index >= 0"),
    ("rag_hybrid", "(60 + r)",
      "r is a row_number() rank >= 1 (RRF denominator)"),
    ("sql_q14", "t",
      "t = sum of cents x (100 - disc_pct) with disc_pct in [0, 100] — every term >= 0 (and p <= t, so the share is a true fraction)"),
    ("sql_q8", "t",
      "t = sum of cents x (100 - disc_pct) with disc_pct in [0, 100] — every term >= 0"),
    ("sql_q8", "CAST(p AS HUGEINT) * 1000000",
      "p = conditional sum of the same non-negative cents x (100 - disc_pct) terms; p <= t"),
    ("sample_weighted", "h",
      "h is the 15-nibble md5 hash (wordHashSqlN): a sum of nonneg nibble*16^i terms — the subtraction in its lineage is the ascii-to-nibble decode (ascii(c) - 48 >= 0 on hex digits)"),
    ("stats_ols", "den",
      "den = n*Sxx - Sx^2 >= 0 by Cauchy-Schwarz (the signed numerators are sign-separated)"),
    ("ts_autocorr", "den_x",
      "den_x = n*Sxx - Sx^2 >= 0 by Cauchy-Schwarz"),
    ("ts_autocorr", "den_y",
      "den_y = n*Syy - Sy^2 >= 0 by Cauchy-Schwarz"),
    ("stats_welch", "aa * 1000",
      "aa = na*Qa - Sa^2 >= 0 by Cauchy-Schwarz (n*sum(x^2) >= sum(x)^2)"),
    ("stats_welch", "ab * 1000",
      "ab = nb*Qb - Sb^2 >= 0 by Cauchy-Schwarz"),
    ("stats_welch", "(na * na - na)",
      "n^2 - n = n(n-1) >= 0 for any count n, and the CASE guard bounds it >= 2 at the division"),
    ("stats_welch", "(nb * nb - nb)",
      "n^2 - n = n(n-1) >= 0 for any count n, and the CASE guard bounds it >= 2 at the division"),
    ("stats_welch", "(aa * nb * nb)",
      "aa = na*Qa - Sa^2 >= 0 by Cauchy-Schwarz; nb is a count >= 0"),
    ("stats_welch", "(ab * na * na)",
      "ab = nb*Qb - Sb^2 >= 0 by Cauchy-Schwarz; na is a count >= 0"),
    ("stats_welch", "w",
      "w = u1 + u2, each a floor quotient of a non-negative product by a positive (n-1); its divisions sit under CASE w > 0 / w = 0 guards"),
    ("stats_welch", "g1",
      "g1 = na - 1 >= 1 under the na < 2 CASE guard wrapping every division it appears in"),
    ("stats_welch", "g2",
      "g2 = nb - 1 >= 1 under the nb < 2 CASE guard wrapping every division it appears in"),
    ("stats_welch", "fr",
      "fr = r1*g2 + r2*g1: floor-mod remainders and (n-1) factors, all >= 0; its division sits under the den = 0 guard (den = 0 implies fr = 0 when w = 0)"),
    ("stats_welch", "den",
      "den = w*gg + fr = t2den exactly, every term >= 0 (aa/ab by Cauchy-Schwarz); divisions sit under the CASE den = 0 guard"),
    ("stats_welch", "biga",
      "biga = 1000 * dnum^2 — a square times a positive constant, >= 0 regardless of dnum's sign; every co-factor (gg, w, fr) is a product/sum of guarded non-negative terms"),
    ("stats_welch", "(r0 * gg - q0 * fr)",
      "evaluated only under the CASE branch r0*gg >= q0*fr — the sign-separated half of the factored floor correction (the other branch handles the negative case by magnitude)"),
    ("stats_welch", "(q0 * fr - r0 * gg - 1)",
      "evaluated only under the ELSE of r0*gg >= q0*fr, i.e. q0*fr >= r0*gg + 1, so the operand >= 0 (floor(-M/D) = -1 - (M-1) div D, M >= 1)"),
    ("ts_forecast", "den",
      "den = n*Stt - St^2 >= 0 by Cauchy-Schwarz (the signed numerators are sign-separated)"),
    ("stats_mannwhitney", "u2 * 1000000",
      "u2 = sum of ca*(2*cum_b_lt + cb) with cum_b_lt = (inclusive prefix) - cb >= 0 (prefix-sum idiom): every term is a product of counts"),
    ("embed_whiten", "t",
      "t = vᵀSv is a PSD quadratic form (= N²·Var_pop(vᵀx) >= 0 by the sum-of-squares identity); every Newton division additionally sits under WHERE t > 0"),
    ("embed_whiten", "x",
      "integer-Newton iterate on t >= 1: seeded >= 1 (greatest(1, ...)) and (x + t//x)//2 >= 1 whenever x, t >= 1"),
    ("embed_whiten", "(x + t // x)",
      "sum of the positive Newton iterate x >= 1 and t//x >= 0 (both non-negative by the entries above)"),
    ("embed_whiten", "d",
      "d = floor-sqrt of the PSD form t, >= 0; the whitening division is guarded by CASE WHEN d = 0")
  )

  /** Mask the CONTENTS of single-quoted string literals with same-length
    * 'x' runs (quotes kept, offsets preserved): a literal containing
    * `//` (a URL, a salt prefix) or ` - ` must never be parsed as a
    * division site or a subtraction. Escaped quotes (`''`) read as two
    * adjacent literals — both masked, which is all the scan needs. */
  private[graft] def neutralizeLiterals(s: String): String = {
    val out = s.toCharArray
    var i = 0
    while (i < out.length) {
      if (out(i) == '\'') {
        var j = i + 1
        while (j < out.length && out(j) != '\'') { out(j) = 'x'; j += 1 }
        i = j + 1
      } else i += 1
    }
    new String(out)
  }

  private val absSignRe = "(?i)\\b(abs|sign)\\s*\\(".r

  /** Replace every `abs(...)`/`sign(...)` span (balanced parens) with a
    * neutral token so their contents can't trip the subtraction scan. */
  private[graft] def neutralize(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      absSignRe.findPrefixMatchOf(s.substring(i)) match {
        case Some(m) =>
          var depth = 1
          var j = i + m.end
          while (j < s.length && depth > 0) {
            if (s(j) == '(') depth += 1
            else if (s(j) == ')') depth -= 1
            j += 1
          }
          out.append("NEUTRAL")
          i = j
        case None =>
          out.append(s(i)); i += 1
      }
    }
    out.toString
  }

  private val aliasRe = "(?i)\\bAS\\s+([A-Za-z_][A-Za-z0-9_]*)".r
  private val identRe = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Words after `AS` that are CAST targets or keywords, not aliases. */
  private val NonAliases = Set(
    "BIGINT", "HUGEINT", "INTEGER", "INT", "SMALLINT", "TINYINT",
    "DECIMAL", "DOUBLE", "FLOAT", "REAL", "VARCHAR", "TEXT", "DATE",
    "TIMESTAMP", "BOOLEAN", "BLOB", "MATERIALIZED", "SELECT")

  /** Aliases whose defining line carries a subtraction (or another
    * signed alias), propagated to fixpoint. Line-granular by design —
    * matches the one-alias-per-line oracle style of this repo.
    * Over-approximates (a count defined NEXT TO a subtraction is
    * marked); the [[allow]] list resolves those with proofs. */
  private[graft] def signedAliases(sql: String): Set[String] = {
    // literals are masked ONCE on the JOINED text (ADVICE r12, the
    // audit/auditHashedTypes convention): a single-quoted literal
    // spanning a newline masked per line would leave the closing
    // line's masking inverted and could hide or fabricate subtraction
    // sites. A newline inside a literal masks to 'x' and merges the
    // two lines — harmless, the literal is one token.
    val lines = neutralizeLiterals(sql).split('\n').map(neutralize)
    var signed = Set.empty[String]
    var changed = true
    while (changed) {
      changed = false
      for (line <- lines) {
        val hasMinus = line.contains(" - ")
        val hasSigned = identRe.findAllIn(line).exists(signed.contains)
        if (hasMinus || hasSigned) {
          for (m <- aliasRe.findAllMatchIn(line)) {
            val a = m.group(1)
            if (!signed.contains(a) && !NonAliases.contains(a.toUpperCase)) {
              signed += a; changed = true
            }
          }
        }
      }
    }
    signed
  }

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_' || c == '.' || c == '\''

  /** Minimal left operand of the `//` at `at`: the maximal backwards
    * chain of `*`/`%`-connected primaries (`//` binds like `*`); an
    * additive boundary terminates it. */
  private[graft] def leftOperand(s: String, at: Int): String = {
    var i = at - 1
    var start = at
    var continue = true
    while (continue) {
      while (i >= 0 && s(i).isWhitespace) i -= 1
      if (i < 0) { continue = false }
      else if (s(i) == ')') {
        var depth = 1; i -= 1
        while (i >= 0 && depth > 0) {
          if (s(i) == ')') depth += 1 else if (s(i) == '(') depth -= 1
          i -= 1
        }
        while (i >= 0 && isIdentChar(s(i))) i -= 1 // attached fn name
        start = i + 1
      } else if (isIdentChar(s(i))) {
        while (i >= 0 && isIdentChar(s(i))) i -= 1
        start = i + 1
      } else {
        continue = false
      }
      if (continue) {
        val save = i
        while (i >= 0 && s(i).isWhitespace) i -= 1
        if (i >= 0 && (s(i) == '*' || s(i) == '%')) i -= 1
        else { i = save; continue = false }
      }
    }
    s.substring(start, at)
  }

  /** Minimal right operand: the single primary after the `//`
    * (a following `*` starts a NEW factor of the enclosing product). */
  private[graft] def rightOperand(s: String, at: Int): String = {
    var i = at
    while (i < s.length && s(i).isWhitespace) i += 1
    val start = i
    if (i < s.length && s(i) == '-') i += 1 // negative literal divisor: flagged by the minus
    if (i < s.length && (s(i).isLetter || s(i) == '_')) {
      while (i < s.length && isIdentChar(s(i))) i += 1
      if (i < s.length && s(i) == '(') { // function call
        var depth = 1; i += 1
        while (i < s.length && depth > 0) {
          if (s(i) == '(') depth += 1 else if (s(i) == ')') depth -= 1
          i += 1
        }
      }
    } else if (i < s.length && s(i) == '(') {
      var depth = 1; i += 1
      while (i < s.length && depth > 0) {
        if (s(i) == '(') depth += 1 else if (s(i) == ')') depth -= 1
        i += 1
      }
    } else {
      while (i < s.length && (s(i).isDigit || s(i) == '.')) i += 1
    }
    s.substring(start, i)
  }

  private def collapseWs(s: String): String =
    s.replaceAll("\\s+", " ").trim

  /** Audit one oracle. Returns human-readable violations (empty = clean). */
  def audit(name: String, sql: String): Seq[String] = {
    val signed = signedAliases(sql)
    // join margin-stripped lines so multi-line operands resolve, keeping
    // a line-offset index for readable reports
    val lines = sql.split('\n').map(_.replaceFirst("^\\s*\\|", " "))
    // literal masking is same-length, so line offsets stay valid
    val joined = neutralizeLiterals(lines.mkString(" "))
    val lineStart = lines.scanLeft(0)((acc, l) => acc + l.length + 1)
    def lineOf(off: Int): Int =
      lineStart.lastIndexWhere(_ <= off) max 0
    def offends(operand: String): Option[String] = {
      val n = neutralize(operand)
      if (n.contains(" - ") || n.matches(".*\\w\\s*-\\s*\\w.*"))
        Some(s"inline subtraction")
      else identRe.findAllIn(n).find(signed.contains)
        .map(a => s"subtraction-lineage alias '$a'")
    }
    def allowed(operand: String): Boolean = {
      val op = collapseWs(operand)
      allow.exists { case (q, pat, _) =>
        name.startsWith(q) && (op == pat || (pat.length >= 4 && op.contains(pat)))
      }
    }
    val out = Seq.newBuilder[String]
    var from = 0
    while (joined.indexOf("//", from) >= 0) {
      val at = joined.indexOf("//", from)
      from = at + 2
      val num = leftOperand(joined, at)
      val den = rightOperand(joined, at + 2)
      val site = collapseWs(s"$num // $den")
      // each operand is judged independently: an allowed denominator
      // must never excuse a signed numerator (the r10 breach shape)
      val hit = offends(num).filterNot(_ => allowed(num)).map("numerator " + _)
        .orElse(offends(den).filterNot(_ => allowed(den)).map("denominator " + _))
      for (reason <- hit)
        out += s"$name line ${lineOf(at) + 1}: $reason in `$site`"
    }
    out.result()
  }

  // ---------------------------------------------------------------
  // Hashed-output typing audit (FIXTURES.md typing rule, r12).
  //
  // Round 11 proved a second cross-engine failure channel besides
  // division semantics: the driver's hasher canonicalizes
  // DECIMAL(38,0) VALUES differently from the local DuckDB even when
  // the math is identical (4 failing queries were exactly the 4 whose
  // final SELECT emitted DECIMAL(38,0); sql_q14's single row was
  // arithmetically identical under truncate, floor AND round). Rule:
  // a hashed final SELECT may emit only BIGINT/INT, VARCHAR,
  // DATE/TIMESTAMP, BOOLEAN, round(x,6) DOUBLE, or arrays thereof —
  // never DECIMAL or HUGEINT (exact >int64 carriers ship as digit
  // strings). Wide types remain fine INTERNALLY (a DECIMAL/HUGEINT
  // cast nested inside an outer CAST(... AS BIGINT) is untouched).
  //
  // Static limit (by design): a bare alias whose CTE-side type is
  // DECIMAL is invisible to this text scan — that side is covered by
  // the Spark-schema gate ([[decimalFields]], asserted by
  // SparkEntrySpec over every query and by Verify at dump time);
  // schema_match then forces the oracle side too.
  // ---------------------------------------------------------------

  private val selectRe = "(?i)\\bSELECT\\b".r
  private val fromRe = "(?i)\\bFROM\\b".r
  private val castTypeRe = "(?i)\\bAS\\s+(DECIMAL|HUGEINT)".r
  private val colonCastRe = "(?i)::\\s*(DECIMAL|HUGEINT)\\s*(\\(\\s*\\d+\\s*(,\\s*\\d+\\s*)?\\))?\\s*$".r

  /** Offsets of regex matches that sit at paren depth 0 of `s`. */
  private def depth0Matches(re: scala.util.matching.Regex, s: String): Seq[Int] = {
    val depthAt = new Array[Int](s.length + 1)
    var d = 0
    var i = 0
    while (i < s.length) {
      depthAt(i) = d
      if (s(i) == '(') d += 1 else if (s(i) == ')') d -= 1
      i += 1
    }
    depthAt(s.length) = d
    re.findAllMatchIn(s).map(_.start).filter(off => depthAt(off) == 0).toSeq
  }

  /** Split `s` on top-level (depth-0) commas. */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s(i) == '(') depth += 1
      else if (s(i) == ')') depth -= 1
      else if (s(i) == ',' && depth == 0) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** The declared type of a projection item whose OUTERMOST expression
    * is a cast, or None when the outermost construct is not a cast. */
  private[graft] def outermostCastType(itemRaw: String): Option[String] = {
    // strip the output alias: explicit `AS ident`/`AS "ident"`, then an
    // IMPLICIT trailing (possibly quoted) identifier after a closing
    // paren — `CAST(x AS DECIMAL(38,0)) slope_num` is valid DuckDB and
    // previously escaped the closedAt == length-1 check (ADVICE r12).
    // The `)` anchor keeps plain multi-word items untouched; the ::
    // cast form needs no strip (colonCastRe matches anywhere).
    val item = itemRaw.trim
      .replaceAll("(?i)\\s+AS\\s+(\"[^\"]+\"|[A-Za-z_][A-Za-z0-9_]*)\\s*$", "")
      .replaceAll("(?i)(\\))\\s+(\"[^\"]+\"|[A-Za-z_][A-Za-z0-9_]*)\\s*$", "$1")
      .trim
    colonCastRe.findFirstMatchIn(item) match {
      case Some(m) => return Some(m.group(1).toUpperCase)
      case None =>
    }
    if (!item.toUpperCase.startsWith("CAST")) return None
    val open = item.indexOf('(')
    if (open < 0) return None
    // the outer CAST's close paren must end the item
    var depth = 1
    var i = open + 1
    var closedAt = -1
    while (i < item.length && closedAt < 0) {
      if (item(i) == '(') depth += 1
      else if (item(i) == ')') { depth -= 1; if (depth == 0) closedAt = i }
      i += 1
    }
    if (closedAt != item.length - 1) return None
    val body = item.substring(open + 1, closedAt)
    // the cast's own type keyword is the LAST depth-0 `AS <type>` in its body
    val d0As = depth0Matches("(?i)\\bAS\\s+([A-Za-z]+)".r, body)
    d0As.lastOption.flatMap { off =>
      "(?i)\\bAS\\s+([A-Za-z]+)".r.findPrefixMatchOf(body.substring(off))
        .map(_.group(1).toUpperCase)
    }
  }

  /** Audit one oracle's FINAL projections for DECIMAL/HUGEINT output
    * carriers. Every depth-0 SELECT belongs to the final statement (CTE
    * bodies and subqueries are parenthesized), so ALL of them are
    * scanned — a top-level UNION ALL's earlier branches type the output
    * just as much as its last (found by the r12 self-review: scanning
    * only the last branch left the r11 breach class a hole). Each
    * projection list ends at the next depth-0 FROM (or end of text). */
  def auditHashedTypes(name: String, sql: String): Seq[String] = {
    val joined = neutralizeLiterals(
      sql.split('\n').map(_.replaceFirst("^\\s*\\|", " ")).mkString(" "))
    val sels = depth0Matches(selectRe, joined)
    val froms = depth0Matches(fromRe, joined)
    // a FROM-less branch (`SELECT 1 AS x UNION ALL ...`) ends at the
    // UNION/ORDER keyword, not at the next SELECT — cut there so the
    // last item stays parseable
    val breaks = depth0Matches("(?i)\\b(UNION|ORDER|EXCEPT|INTERSECT)\\b".r, joined)
    sels.flatMap { sel =>
      val listStart = sel + "SELECT".length
      val listEnd = (froms.filter(_ > listStart) ++
        sels.filter(_ > listStart) ++ breaks.filter(_ > listStart)).sorted
        .headOption.getOrElse(joined.length)
      val items = splitTopLevel(joined.substring(listStart, listEnd))
      items.flatMap { it =>
        outermostCastType(it) match {
          case Some(t) if t == "DECIMAL" || t == "HUGEINT" =>
            Some(s"$name: hashed output column is $t (FIXTURES.md typing " +
              s"rule: emit BIGINT or digit strings) in `${collapseWs(it)}`")
          case _ => None
        }
      }
    }
  }

  /** Dotted paths of every DecimalType field in a Spark schema,
    * including array/map/struct nesting — the engine-side half of the
    * typing rule (a hashed output schema must carry no DecimalType). */
  def decimalFields(schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    import org.apache.spark.sql.types._
    def walk(dt: DataType, path: String): Seq[String] = dt match {
      case _: DecimalType => Seq(path)
      case s: StructType => s.fields.toSeq.flatMap(f => walk(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => walk(a.elementType, s"$path[]")
      case m: MapType => walk(m.keyType, s"$path<key>") ++ walk(m.valueType, s"$path<value>")
      case _ => Nil
    }
    schema.fields.toSeq.flatMap(f => walk(f.dataType, f.name))
  }

  /** Audit a full oracle map; returns all violations (negative-division
    * sites AND hashed-output DECIMAL/HUGEINT carriers). */
  def auditAll(oracles: Map[String, String]): Seq[String] =
    oracles.toSeq.sortBy(_._1).flatMap { case (n, s) =>
      audit(n, s) ++ auditHashedTypes(n, s)
    }
}
