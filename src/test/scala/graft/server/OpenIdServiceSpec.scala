package graft.server

import java.nio.charset.StandardCharsets
import java.security.{KeyPair, KeyPairGenerator, Signature}
import java.security.interfaces.{RSAPrivateKey, RSAPublicKey}
import java.util.Base64

import graft.SparkSpec
import graft.core.Catalog
import graft.workflow.Engine

/**
 * OIDC bearer validation against a stubbed JWKS endpoint: tokens are
 * minted in-test with a real RSA keypair and verified through the same
 * code path production uses (`oph_auth.c:1164` check semantics —
 * signature, iat/exp window, issuer, audience, user claim).
 */
class OpenIdServiceSpec extends SparkSpec {

  private val b64 = Base64.getUrlEncoder.withoutPadding
  private def enc(s: String): String =
    b64.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  private def keypair(): KeyPair = {
    val g = KeyPairGenerator.getInstance("RSA")
    g.initialize(2048)
    g.generateKeyPair()
  }

  private def jwks(kp: KeyPair, kid: String = "k1"): String = {
    val pub = kp.getPublic.asInstanceOf[RSAPublicKey]
    def uint(b: java.math.BigInteger): String = {
      val raw = b.toByteArray
      b64.encodeToString(if (raw(0) == 0) raw.drop(1) else raw)
    }
    s"""{"keys":[{"kty":"RSA","kid":"$kid","alg":"RS256",
       |"n":"${uint(pub.getModulus)}","e":"${uint(pub.getPublicExponent)}"}]}"""
      .stripMargin
  }

  private def sign(kp: KeyPair, headerAndPayload: String): String = {
    val s = Signature.getInstance("SHA256withRSA")
    s.initSign(kp.getPrivate.asInstanceOf[RSAPrivateKey])
    s.update(headerAndPayload.getBytes(StandardCharsets.US_ASCII))
    b64.encodeToString(s.sign())
  }

  private def jwt(kp: KeyPair, claims: String, kid: String = "k1",
      alg: String = "RS256"): String = {
    val hp = enc(s"""{"alg":"$alg","kid":"$kid"}""") + "." + enc(claims)
    hp + "." + sign(kp, hp)
  }

  private val t0 = 1700000000L // injectable "now" (epoch seconds)

  private def service(kp: KeyPair, clientId: String = "graft-client",
      allowLocal: Boolean = true, claim: String = "sub",
      fetches: java.util.concurrent.atomic.AtomicInteger =
        new java.util.concurrent.atomic.AtomicInteger): OpenIdService =
    new OpenIdService(
      OpenIdConfig("https://idp.example/op", clientId, claim, allowLocal),
      now = () => t0,
      fetch = url => {
        assert(url == "https://idp.example/op/jwk")
        fetches.incrementAndGet()
        jwks(kp)
      })

  private def claims(sub: String = "alice", iat: Long = t0 - 60,
      exp: Long = t0 + 600, iss: String = "https://idp.example/op",
      aud: String = "graft-client"): String =
    s"""{"sub":"$sub","iat":$iat,"exp":$exp,"iss":"$iss","aud":"$aud"}"""

  test("valid RS256 token resolves to the sub claim") {
    val kp = keypair()
    assert(service(kp).validate(jwt(kp, claims())) == Some("alice"))
  }

  test("expired, not-yet-valid, and missing-exp tokens are rejected") {
    val kp = keypair(); val svc = service(kp)
    assert(svc.validate(jwt(kp, claims(exp = t0 - 1))).isEmpty)
    assert(svc.validate(jwt(kp, claims(iat = t0 + 30))).isEmpty)
    assert(svc.validate(jwt(kp,
      s"""{"sub":"alice","iat":${t0 - 60},"iss":"https://idp.example/op"}"""))
      .isEmpty, "a token with no exp must not live forever")
  }

  test("foreign-key, tampered, alg=none and HS256 tokens are rejected") {
    val kp = keypair(); val svc = service(kp)
    val foreign = keypair() // same claims, another issuer's key
    assert(svc.validate(jwt(foreign, claims())).isEmpty)
    val good = jwt(kp, claims())
    val Array(h, p, s) = good.split('.')
    val tampered = h + "." + enc(claims(sub = "mallory")) + "." + s
    assert(svc.validate(tampered).isEmpty)
    val none = enc("""{"alg":"none"}""") + "." + enc(claims()) + "."
    assert(svc.validate(none).isEmpty)
    assert(svc.validate(jwt(kp, claims(), alg = "HS256")).isEmpty)
    assert(svc.validate("not-a-jwt").isEmpty)
  }

  test("issuer and audience mismatches are rejected; string or array aud") {
    val kp = keypair(); val svc = service(kp)
    assert(svc.validate(jwt(kp, claims(iss = "https://evil.example")))
      .isEmpty)
    assert(svc.validate(jwt(kp, claims(aud = "other-client"))).isEmpty)
    val arrAud = s"""{"sub":"alice","iat":${t0 - 60},"exp":${t0 + 600},
      |"iss":"https://idp.example/op","aud":["x","graft-client"]}"""
      .stripMargin
    assert(svc.validate(jwt(kp, arrAud)) == Some("alice"))
  }

  test("JWKS is cached; unknown kid triggers exactly one re-fetch") {
    val kp = keypair()
    val fetches = new java.util.concurrent.atomic.AtomicInteger
    val svc = service(kp, fetches = fetches)
    assert(svc.validate(jwt(kp, claims())).isDefined)
    assert(svc.validate(jwt(kp, claims())).isDefined)
    assert(fetches.get == 1, "second validation must reuse the cached key")
    assert(svc.validate(jwt(kp, claims(), kid = "rotated")).isEmpty)
    assert(fetches.get == 2, "unknown kid re-fetches once then rejects")
  }

  test("configurable user claim (email, oph_auth.c:1130)") {
    val kp = keypair()
    val svc = service(kp, claim = "email")
    val c = s"""{"sub":"x","email":"alice@example.org","iat":${t0 - 1},
      |"exp":${t0 + 60},"iss":"https://idp.example/op","aud":"graft-client"}"""
      .stripMargin
    assert(svc.validate(jwt(kp, c)) == Some("alice@example.org"))
  }

  test("AuthService: OIDC bearer accepted, local users work when allowed") {
    val kp = keypair()
    val auth = new AuthService(openId = Some(service(kp)))
    auth.addUser("graft", "secret")
    assert(auth.authenticate(
      Some("Bearer " + jwt(kp, claims())), "h") == Some("alice"))
    // the reference's __token__-as-password convention takes JWTs too
    val b = Base64.getEncoder.encodeToString(
      s"__token__:${jwt(kp, claims())}".getBytes(StandardCharsets.UTF_8))
    assert(auth.authenticate(Some("Basic " + b), "h") == Some("alice"))
    assert(auth.login("graft", "secret", "h").isDefined,
      "allow_local_user keeps password logins working")
    assert(auth.authenticate(
      Some("Bearer " + jwt(kp, claims(exp = t0 - 1))), "h").isEmpty)
  }

  test("AuthService: federation-only refuses password credentials") {
    val kp = keypair()
    val auth = new AuthService(
      openId = Some(service(kp, allowLocal = false)))
    auth.addUser("graft", "secret")
    assert(auth.login("graft", "secret", "h").isEmpty)
    assert(auth.authenticate(Some(
      "Basic " + Base64.getEncoder.encodeToString(
        "graft:secret".getBytes(StandardCharsets.UTF_8))), "h").isEmpty)
    assert(auth.authenticatePassword(Some(
      "Basic " + Base64.getEncoder.encodeToString(
        "graft:secret".getBytes(StandardCharsets.UTF_8)))).isEmpty)
    assert(auth.authenticate(
      Some("Bearer " + jwt(kp, claims())), "h") == Some("alice"),
      "OIDC stays the only door")
  }

  test("e2e over HTTP: OIDC bearer drives a request; expired gets 401") {
    val kp = keypair()
    val engine = new Engine(spark, new Catalog("sess"), user = "alice")
    val auth = new AuthService(openId = Some(service(kp)))
    auth.addUser("graft", "secret")
    val svc = new HttpService(engine, auth).start()
    try {
      val base = s"http://127.0.0.1:${svc.boundPort}"
      def post(tok: String): Int = {
        val c = java.net.URI.create(s"$base/services/info").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod("GET")
        c.setRequestProperty("Authorization", s"Bearer $tok")
        c.getResponseCode
      }
      assert(post(jwt(kp, claims())) == 200)
      assert(post(jwt(kp, claims(exp = t0 - 1))) == 401)
      assert(post(jwt(keypair(), claims())) == 401, "foreign issuer key")
    } finally svc.stop()
  }
}
