package graft.validate

import java.time.format.DateTimeFormatter
import java.util.regex.Pattern
import scala.util.Try

/** draft-7 `format` checkers.
  *
  * Same observable behavior as the reference's `check-format` multimethod
  * (`/root/reference/src/juxt/jinx/alpha/validate.cljc:548-688`): string-only
  * (non-strings pass), unknown formats pass, date/time via `java.time`
  * ISO formatters, the rest via regexes composed from the RFC ABNF grammars
  * (RFC 5322/6532 addr-spec, RFC 1034 hostname, RFC 3986 URI, RFC 3987 IRI,
  * RFC 6901 JSON pointer). The pattern strings below are derived directly
  * from the public RFC grammars.
  */
object Formats {

  // ---- RFC 3986 building blocks -------------------------------------------
  private val unreserved = "[A-Za-z0-9\\-._~]"
  private val pctEncoded = "%[0-9A-Fa-f]{2}"
  private val subDelims = "[!$&'()*+,;=]"
  private val decOctet = "(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9][0-9]|[0-9])"
  val ipv4Pattern: String = s"$decOctet\\.$decOctet\\.$decOctet\\.$decOctet"

  private val h16 = "[0-9A-Fa-f]{1,4}"
  private val ls32 = s"(?:$h16:$h16|$ipv4Pattern)"
  /** RFC 3986 / RFC 4291 IPv6address — the nine ABNF alternatives. */
  val ipv6Pattern: String = Seq(
    s"(?:$h16:){6}$ls32",
    s"::(?:$h16:){5}$ls32",
    s"(?:$h16)?::(?:$h16:){4}$ls32",
    s"(?:(?:$h16:){0,1}$h16)?::(?:$h16:){3}$ls32",
    s"(?:(?:$h16:){0,2}$h16)?::(?:$h16:){2}$ls32",
    s"(?:(?:$h16:){0,3}$h16)?::$h16:$ls32",
    s"(?:(?:$h16:){0,4}$h16)?::$ls32",
    s"(?:(?:$h16:){0,5}$h16)?::$h16",
    s"(?:(?:$h16:){0,6}$h16)?::"
  ).mkString("(?:", "|", ")")

  private def uriParts(uc: String, privateChars: String): (String, String) = {
    // `uc` extends unreserved with ucschar for the IRI variants (RFC 3987).
    val unres = if (uc.isEmpty) unreserved else s"(?:$unreserved|[$uc])"
    val pchar = s"(?:$unres|$pctEncoded|$subDelims|[:@])"
    val ipvFuture = s"v[0-9A-Fa-f]+\\.(?:$unreserved|$subDelims|:)+"
    val ipLiteral = s"\\[(?:$ipv6Pattern|$ipvFuture)\\]"
    val regName = s"(?:$unres|$pctEncoded|$subDelims)*"
    val userinfo = s"(?:$unres|$pctEncoded|$subDelims|:)*"
    val host = s"(?:$ipLiteral|$ipv4Pattern|$regName)"
    val authority = s"(?:$userinfo@)?$host(?::[0-9]*)?"
    val segment = s"$pchar*"
    val segmentNz = s"$pchar+"
    val segmentNzNc = s"(?:$unres|$pctEncoded|$subDelims|@)+"
    val pathAbempty = s"(?:/$segment)*"
    val pathAbsolute = s"/(?:$segmentNz(?:/$segment)*)?"
    val pathNoscheme = s"$segmentNzNc(?:/$segment)*"
    val pathRootless = s"$segmentNz(?:/$segment)*"
    val scheme = "[A-Za-z][A-Za-z0-9+.\\-]*"
    val query = s"(?:$pchar|[/?$privateChars])*"
    val fragment = s"(?:$pchar|[/?])*"
    val hierPart = s"(?://$authority$pathAbempty|$pathAbsolute|$pathRootless|)"
    val relativePart = s"(?://$authority$pathAbempty|$pathAbsolute|$pathNoscheme|)"
    val uri = s"$scheme:$hierPart(?:\\?$query)?(?:#$fragment)?"
    val relativeRef = s"$relativePart(?:\\?$query)?(?:#$fragment)?"
    (uri, relativeRef)
  }

  val (uriPattern, relativeRefPattern) = uriParts("", "")
  // RFC 3987 ucschar, BMP ranges only (full astral ranges kill regex compile
  // time — the reference makes the same trade, patterns.clj:313-334).
  private val ucschar = "\\xA0-\\uD7FF\\uF900-\\uFDCF\\uFDF0-\\uFFEF"
  private val iprivate = "\\uE000-\\uF8FF"
  val (iriPattern, irelativeRefPattern) = uriParts(ucschar, iprivate)

  // ---- RFC 1034 hostname ---------------------------------------------------
  /** subdomain = label *("." label); label starts with a letter, ends with a
    * letter or digit, hyphens inside (RFC 1034 §3.5). */
  val hostnamePattern: String = {
    val label = "[A-Za-z](?:[A-Za-z0-9\\-]*[A-Za-z0-9])?"
    s"$label(?:\\.$label)*"
  }

  // ---- RFC 5322 / RFC 6532 addr-spec (dot-atom form only, like the ref) ---
  private def addrSpec(extra: String): String = {
    val atext = s"[A-Za-z0-9!#$$%&'*+/=?^_`{|}~\\-$extra]"
    val dotAtom = s"$atext+(?:\\.$atext+)*"
    val dtext = s"[\\x21-\\x5A\\x5E-\\x7E$extra]"
    val domainLiteral = s"\\[$dtext*\\]"
    s"$dotAtom@(?:$dotAtom|$domainLiteral)"
  }
  val emailPattern: String = addrSpec("")
  val idnEmailPattern: String = addrSpec(ucschar)

  // ---- RFC 6901 -----------------------------------------------------------
  val jsonPointerPattern: String = "(?:/(?:[^/~]|~[01])*)*"
  val relativeJsonPointerPattern: String =
    s"(?:0|[1-9][0-9]*)(?:#|$jsonPointerPattern)"

  // ---- compiled ------------------------------------------------------------
  private def full(p: String): Pattern = Pattern.compile(p)
  private lazy val ipv4Re = full(ipv4Pattern)
  private lazy val ipv6Re = full(ipv6Pattern)
  private lazy val uriRe = full(uriPattern)
  private lazy val relRefRe = full(relativeRefPattern)
  private lazy val iriRe = full(iriPattern)
  private lazy val irelRefRe = full(irelativeRefPattern)
  private lazy val hostnameRe = full(hostnamePattern)
  private lazy val emailRe = full(emailPattern)
  private lazy val idnEmailRe = full(idnEmailPattern)
  private lazy val jsonPtrRe = full(jsonPointerPattern)
  private lazy val relJsonPtrRe = full(relativeJsonPointerPattern)

  private def matches(re: Pattern, s: String): Boolean = re.matcher(s).matches()

  def hostname(s: String): Boolean =
    matches(hostnameRe, s) &&
      s.split('.').forall(_.length <= 63) &&
      s.length <= 255

  def idnHostname(s: String): Boolean =
    Try(java.net.IDN.toASCII(s)).toOption.exists { ace =>
      // Reject Hangul single dot tone mark U+302E (RFC 5892 contextual rule
      // the JDK doesn't enforce), then check the ACE form as a hostname.
      !s.exists(_ == '〮') && hostname(ace)
    }

  private def parses(fmt: DateTimeFormatter, s: String): Boolean =
    Try(fmt.parse(s)).isSuccess

  /** Returns true when `s` conforms to `format`; unknown formats → true. */
  def check(format: String, s: String): Boolean = format match {
    case "date-time"             => parses(DateTimeFormatter.ISO_DATE_TIME, s)
    case "date"                  => parses(DateTimeFormatter.ISO_LOCAL_DATE, s)
    case "time"                  => parses(DateTimeFormatter.ISO_TIME, s)
    case "email"                 => matches(emailRe, s)
    case "idn-email"             => matches(idnEmailRe, s)
    case "hostname"              => hostname(s)
    case "idn-hostname"          => idnHostname(s)
    case "ipv4"                  => matches(ipv4Re, s)
    case "ipv6"                  => matches(ipv6Re, s)
    case "uri"                   => matches(uriRe, s)
    case "uri-reference"         => matches(uriRe, s) || matches(relRefRe, s)
    case "iri"                   => matches(iriRe, s)
    case "iri-reference"         => matches(iriRe, s) || matches(irelRefRe, s)
    // Approximated by the URI grammar, like the reference
    // (validate.cljc:654-659); excluded from the suite.
    case "uri-template"          => matches(uriRe, s)
    case "json-pointer"          => matches(jsonPtrRe, s)
    case "relative-json-pointer" => matches(relJsonPtrRe, s)
    case "regex" =>
      // The \Z anchor is .NET-only; the reference rejects it explicitly
      // (validate.cljc:678-680).
      !s.contains("\\Z") && Try(Pattern.compile(s)).isSuccess
    case _ => true
  }
}
