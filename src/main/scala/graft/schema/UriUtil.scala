package graft.schema

import java.net.{URI, URLDecoder}

/** RFC 3986 reference resolution, mirroring the reference's use of
  * `lambdaisland.uri/join` (`/root/reference/src/juxt/jinx/alpha/resolve.cljc:113-131`,
  * `schema.cljc:29`).
  */
object UriUtil {

  /** Join a (possibly absent / relative) base with a URI reference. */
  def join(base: Option[String], ref: String): String = {
    val b = base.getOrElse("")
    if (ref == null || ref.isEmpty) b
    else if (b.isEmpty) ref
    else
      try {
        val r = new URI(ref)
        if (r.isAbsolute) ref
        else {
          val bu = new URI(b)
          if (bu.isOpaque) {
            // java.net.URI refuses to resolve against opaque bases
            if (ref.startsWith("#")) stripFragment(b) + ref else ref
          } else bu.resolve(r).toString
        }
      } catch {
        case _: Exception =>
          if (ref.startsWith("#")) stripFragment(b) + ref else ref
      }
  }

  def stripFragment(uri: String): String = {
    val i = uri.indexOf('#')
    if (i >= 0) uri.substring(0, i) else uri
  }

  /** The reference URL-decodes `$ref` values before joining
    * (`resolve.cljc:119-120`, `java.net.URLDecoder/decode`). */
  def urlDecode(s: String): String = URLDecoder.decode(s, "UTF-8")

  /** Split "docref#fragment" like the reference's
    * `(str/split uri #"#")` (`resolve.cljc:95`). */
  def splitFragment(uri: String): (String, Option[String]) = {
    val i = uri.indexOf('#')
    if (i < 0) (uri, None)
    else {
      val frag = uri.substring(i + 1)
      (uri.substring(0, i), if (frag.isEmpty) None else Some(frag))
    }
  }
}
