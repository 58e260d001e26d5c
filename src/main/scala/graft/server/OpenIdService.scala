package graft.server

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import java.security.KeyFactory
import java.security.interfaces.RSAPublicKey
import java.security.spec.RSAPublicKeySpec
import java.util.Base64

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/**
 * OpenID Connect bearer-token validation — the reference's OPENID
 * surface (`/root/reference/src/oph_auth.c:90-96` config: endpoint,
 * client id/secret, user-name claim, allow-local-user flag). The
 * reference fetches the endpoint's public key from `{endpoint}/jwk`
 * (`oph_auth.c:862`), verifies the JWT signature, and rejects tokens
 * outside their [iat, exp] window (`oph_auth_check_token_openid`,
 * `oph_auth.c:1164`); the user id comes from a configurable claim
 * (default `sub`, `oph_auth.c:1130`).
 *
 * This implementation is pure JVM: RS256 via `java.security.Signature`,
 * JWKS JSON via Jackson. The JWKS fetch is injectable so tests stub the
 * endpoint; production uses a plain HTTP(S) GET. Keys are cached and
 * re-fetched once on an unknown `kid` (standard rotation handling).
 *
 * @param allowLocalUser reference `OPENID_ALLOW_LOCAL_USER`
 *   (`oph_execute_main.c:366`): when set, an OIDC subject that names a
 *   LOCAL user acts as that local user (keeping its roles), and local
 *   password logins stay enabled alongside the federation; when unset,
 *   the deployment is federation-only — password logins are refused.
 */
final case class OpenIdConfig(
    endpoint: String,
    clientId: String = "",
    userClaim: String = "sub",
    allowLocalUser: Boolean = true)

final class OpenIdService(
    config: OpenIdConfig,
    now: () => Long = () => System.currentTimeMillis / 1000L,
    fetch: String => String = OpenIdService.httpGet) {

  private val mapper = new ObjectMapper()
  @volatile private var keys: Map[String, RSAPublicKey] = Map.empty

  private def decode(part: String): Array[Byte] =
    Base64.getUrlDecoder.decode(part)

  private def loadKeys(): Map[String, RSAPublicKey] = {
    // the reference's JWKS path is {endpoint}/jwk (`oph_auth.c:862`)
    val root = mapper.readTree(
      fetch(config.endpoint.stripSuffix("/") + "/jwk"))
    val arr = Option(root.get("keys")).map { ks =>
      (0 until ks.size).map(ks.get)
    }.getOrElse(if (root.has("kty")) Seq(root) else Seq.empty)
    arr.flatMap { k =>
      for {
        kty <- Option(k.get("kty")).map(_.asText) if kty == "RSA"
        n <- Option(k.get("n")).map(_.asText)
        e <- Option(k.get("e")).map(_.asText)
      } yield {
        val pub = KeyFactory.getInstance("RSA").generatePublic(
          new RSAPublicKeySpec(new BigInteger(1, decode(n)),
            new BigInteger(1, decode(e)))).asInstanceOf[RSAPublicKey]
        Option(k.get("kid")).map(_.asText).getOrElse("") -> pub
      }
    }.toMap
  }

  private def keyFor(kid: Option[String]): Option[RSAPublicKey] = {
    def pick(m: Map[String, RSAPublicKey]): Option[RSAPublicKey] =
      kid match {
        case Some(id) => m.get(id)
        case None => if (m.size == 1) m.values.headOption else m.get("")
      }
    pick(keys).orElse {
      // unknown kid: one re-fetch (key rotation), then give up
      try { keys = loadKeys() } catch { case _: Exception => }
      pick(keys)
    }
  }

  /** Validate a compact JWS bearer token; Some(user claim) iff the
    * signature verifies against the endpoint's key set, the algorithm
    * is RS256 (an attacker-chosen `none`/HS256 header is an automatic
    * reject), `iat <= now <= exp` (`oph_auth.c:1178-1190`), the issuer
    * (when claimed) is the configured endpoint, and the audience (when
    * claimed and a client id is configured) contains the client id. */
  def validate(token: String): Option[String] = {
    val parts = token.split('.')
    if (parts.length != 3) return None
    try {
      val header = mapper.readTree(
        new String(decode(parts(0)), StandardCharsets.UTF_8))
      if (!Option(header.get("alg")).map(_.asText).contains("RS256"))
        return None
      val key = keyFor(Option(header.get("kid")).map(_.asText))
        .getOrElse(return None)
      val sig = java.security.Signature.getInstance("SHA256withRSA")
      sig.initVerify(key)
      sig.update((parts(0) + "." + parts(1))
        .getBytes(StandardCharsets.US_ASCII))
      if (!sig.verify(decode(parts(2)))) return None

      val payload = mapper.readTree(
        new String(decode(parts(1)), StandardCharsets.UTF_8))
      val t = now()
      val iat = Option(payload.get("iat")).map(_.asLong)
      val exp = Option(payload.get("exp")).map(_.asLong)
      if (iat.exists(t < _)) return None // not valid yet
      if (exp.forall(t > _)) return None // expired (or no exp at all)
      if (Option(payload.get("iss")).map(_.asText)
          .exists(_ != config.endpoint)) return None
      if (config.clientId.nonEmpty) {
        Option(payload.get("aud")).foreach { aud =>
          val auds =
            if (aud.isArray) (0 until aud.size).map(aud.get(_).asText)
            else Seq(aud.asText)
          if (!auds.contains(config.clientId)) return None
        }
      }
      Option(payload.get(config.userClaim)).map(_.asText)
        .filter(_.nonEmpty)
    } catch {
      case _: Exception => None // malformed base64/JSON/key = bad token
    }
  }

  def allowLocalUser: Boolean = config.allowLocalUser
}

object OpenIdService {
  /** Production JWKS fetch: plain GET with a bounded timeout. */
  def httpGet(url: String): String = {
    val conn = java.net.URI.create(url).toURL.openConnection()
    conn.setConnectTimeout(30000) // reference AUTH_CONNECTTIMEOUT
    conn.setReadTimeout(30000)
    val in = conn.getInputStream
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Build from the GRAFT_OPENID_* environment (reference server.conf
    * OPENID_ENDPOINT / OPENID_CLIENT_ID / OPENID_USER_NAME /
    * OPENID_ALLOW_LOCAL_USER keys, `src/oph_gather.h:82-88`). */
  def fromEnv(env: Map[String, String]): Option[OpenIdService] =
    env.get("GRAFT_OPENID_ENDPOINT").filter(_.nonEmpty).map { ep =>
      new OpenIdService(OpenIdConfig(
        endpoint = ep,
        clientId = env.getOrElse("GRAFT_OPENID_CLIENT_ID", ""),
        userClaim = env.getOrElse("GRAFT_OPENID_USER_CLAIM", "sub"),
        allowLocalUser = !env.get("GRAFT_OPENID_ALLOW_LOCAL_USER")
          .exists(v => v.equalsIgnoreCase("no") ||
            v.equalsIgnoreCase("false"))))
    }
}
