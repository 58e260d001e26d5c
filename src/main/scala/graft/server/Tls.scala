package graft.server

import java.nio.file.{Files, Path}

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/**
 * TLS materials for the HTTP service — the Spark-first equivalent of
 * the reference's SSL transport (`/root/reference/src/ssl/oph_server.c`
 * wraps the SOAP endpoint in an SSL_CTX loaded from server cert/key
 * PEM files; GSI/VOMS in `src/gsi/gsi.c` is the grid variant). The JVM
 * formulation is a PKCS12 keystore turned into an `SSLContext` for
 * `HttpsServer`.
 *
 * Production deployments point at a real keystore; `devSelfSigned()`
 * mints a throwaway self-signed cert at startup for dev/test, matching
 * the reference's bundled default `server.pem` workflow.
 */
final case class Tls(keystore: Path, password: Array[Char]) {

  private def loadStore(): java.security.KeyStore = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = Files.newInputStream(keystore)
    try ks.load(in, password)
    finally in.close()
    ks
  }

  /** Server-side context: private key + cert chain from the store. */
  def sslContext(): SSLContext = {
    val ks = loadStore()
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** The server certificate (first chain entry of the first key
    * alias) — what a client pins to trust a self-signed dev server. */
  def certificate(): java.security.cert.Certificate = {
    val ks = loadStore()
    val aliases = ks.aliases()
    while (aliases.hasMoreElements) {
      val a = aliases.nextElement()
      val c = ks.getCertificate(a)
      if (c != null) return c
    }
    throw new IllegalStateException(s"no certificate in $keystore")
  }

  /** Client-side context trusting exactly this server's certificate —
    * for tests and dev clients talking to `devSelfSigned()` servers. */
  def clientContext(): SSLContext = {
    val trust = java.security.KeyStore.getInstance("PKCS12")
    trust.load(null, null)
    trust.setCertificateEntry("server", certificate())
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(trust)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }
}

object Tls {

  /** Generate a throwaway self-signed RSA cert into a temp PKCS12
    * keystore via the JDK's own `keytool` (the JDK exposes no public
    * API for minting X509 certificates). The file lives for the
    * process only; a random password keeps a same-host snooper from
    * reading the key material out of /tmp. */
  def devSelfSigned(cn: String = "localhost"): Tls = {
    val pw = java.util.UUID.randomUUID().toString
    val file = Files.createTempFile("graft_tls", ".p12")
    Files.delete(file) // keytool refuses to write into an existing file
    val keytool = Path.of(System.getProperty("java.home"), "bin", "keytool")
    val cmd = Seq(keytool.toString, "-genkeypair",
      "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048",
      "-validity", "7",
      "-dname", s"CN=$cn",
      "-ext", s"SAN=dns:$cn,ip:127.0.0.1",
      "-storetype", "PKCS12",
      "-keystore", file.toString,
      "-storepass", pw)
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(proc.getInputStream.readAllBytes,
      java.nio.charset.StandardCharsets.UTF_8)
    val code = proc.waitFor()
    if (code != 0 || !Files.exists(file))
      throw new IllegalStateException(
        s"keytool failed ($code): ${out.take(500)}")
    file.toFile.deleteOnExit()
    Tls(file, pw.toCharArray)
  }
}
