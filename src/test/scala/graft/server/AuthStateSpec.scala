package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** State-file round-trip hygiene (ADVICE r14): a persisted user-props
  * line must survive a restart byte-exactly in MEANING — an empty cdd
  * or one corrupt sibling line must never silently revert a user to
  * enabled/unlimited (reference user.dat semantics: the props ARE the
  * security gate, `src/oph_auth.h` OPH_USER_*). */
class AuthStateSpec extends AnyFunSuite {
  import AuthService.UserProps

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_auth").resolve("auth.tsv")

  test("props with empty cdd survive a restart (trailing-field parse)") {
    val f = tmp()
    val a1 = new AuthService(stateFile = Some(f))
    a1.addUser("u", "pw")
    a1.setUserProps("u", UserProps(enabled = false, maxSessions = 2,
      maxCores = 4, maxHosts = 1, timeoutSessionDays = 7, cdd = ""))
    val a2 = new AuthService(stateFile = Some(f))
    val p = a2.userProps("u")
    assert(!p.enabled, "disabled gate must survive the restart")
    assert(p.maxSessions == 2 && p.maxCores == 4 && p.maxHosts == 1 &&
      p.timeoutSessionDays == 7)
    assert(p.cdd == "/", "empty cdd normalizes to the root default")
  }

  test("one corrupt P line skips, the rest of the state still loads") {
    val f = tmp()
    val a1 = new AuthService(stateFile = Some(f))
    a1.addUser("good", "pw")
    a1.setUserProps("good", UserProps(enabled = false, maxSessions = 3))
    // corrupt a sibling line in place: non-numeric maxSessions
    val text = new String(java.nio.file.Files.readAllBytes(f),
      java.nio.charset.StandardCharsets.UTF_8)
    java.nio.file.Files.write(f,
      (text + "P\tbad\t0\tNaN\t0\t0\t0\t/\n").getBytes("UTF-8"))
    val a2 = new AuthService(stateFile = Some(f))
    assert(!a2.userProps("good").enabled,
      "a corrupt sibling line must not abort the whole restore")
    assert(a2.userProps("good").maxSessions == 3)
    assert(a2.userProps("bad") == UserProps(),
      "the corrupt line itself falls back to defaults")
  }
}
