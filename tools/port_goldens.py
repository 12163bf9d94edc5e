"""Port the reference's vitest snapshot corpora into JSON golden files.

Reads test inputs from /root/reference/src/*.spec.ts and expected event
streams from /root/reference/src/__snapshots__/*.snap (PUBLIC reference
content, used as test *data*, not code), producing:

  tests/goldens/parser_events.json  — ~100 cases from Parser.events.spec.ts
  tests/goldens/tokenizer.json      — raw callback logs from Tokenizer.spec.ts

Run from the repo root: python tools/port_goldens.py
"""

from __future__ import annotations

import json
import pathlib
import re

REF = pathlib.Path("/root/reference/src")
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"


# ---------------- JS literal mini-readers ----------------

_ESCAPES = {
    "n": "\n",
    "t": "\t",
    "r": "\r",
    "b": "\b",
    "f": "\f",
    "v": "\v",
    "0": "\0",
    "'": "'",
    '"': '"',
    "`": "`",
    "\\": "\\",
    "/": "/",
}


def read_js_string(s: str, i: int) -> tuple[str, int]:
    """Read a JS string literal starting at s[i] (quote char). Returns
    (value, index just past the closing quote)."""
    quote = s[i]
    assert quote in "'\"`", f"not a string at {i}: {s[i:i+20]!r}"
    i += 1
    out = []
    while True:
        c = s[i]
        if c == quote:
            return "".join(out), i + 1
        if c == "\\":
            nxt = s[i + 1]
            if nxt == "u":
                if s[i + 2] == "{":
                    j = s.index("}", i + 3)
                    out.append(chr(int(s[i + 3 : j], 16)))
                    i = j + 1
                else:
                    out.append(chr(int(s[i + 2 : i + 6], 16)))
                    i += 6
            elif nxt == "x":
                out.append(chr(int(s[i + 2 : i + 4], 16)))
                i += 4
            else:
                out.append(_ESCAPES.get(nxt, nxt))
                i += 2
        else:
            out.append(c)
            i += 1


def read_options(s: str, i: int) -> dict:
    """Read a flat `{ key: true/false }` object literal starting at s[i]."""
    j = s.index("}", i)
    body = s[i + 1 : j]
    opts = {}
    for m in re.finditer(r"(\w+)\s*:\s*(true|false)", body):
        opts[m.group(1)] = m.group(2) == "true"
    return opts


def skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in " \t\n\r":
        i += 1
    return i


# ---------------- spec extraction ----------------

def extract_cases(spec: str, runner: str) -> list[dict]:
    """Extract (name, input, options) triples from `it("name", () => runner(...))`."""
    cases = []
    for m in re.finditer(r'it\(\s*(["\'])', spec):
        name, i = read_js_string(spec, m.end() - 1)
        call = spec.find(runner + "(", i)
        # Ensure the runner call belongs to this `it` (no other `it(` between).
        nxt = spec.find("it(", i)
        if call == -1 or (nxt != -1 and nxt < call):
            continue
        i = skip_ws(spec, call + len(runner) + 1)
        if spec[i] not in "'\"`":
            continue
        text, i = read_js_string(spec, i)
        i = skip_ws(spec, i)
        opts = {}
        if spec[i] == ",":
            i = skip_ws(spec, i + 1)
            if spec[i] == "{":
                opts = read_options(spec, i)
        cases.append({"name": name, "input": text, "options": opts})
    return cases


# ---------------- snapshot extraction ----------------

def _parse_pretty_lines(lines: list[str], i: int):
    """Recursive-descent parser for vitest pretty-format output.

    One value per line, every element followed by a trailing comma.
    Strings are printed raw between double quotes WITHOUT escaping inner
    quotes, so a string value spans from the first '"' to the final '"'
    before the trailing comma (accumulating lines for embedded newlines).
    Returns (value, next_line_index).
    """
    line = lines[i].strip()
    if line in ("[", "[{") or line == "[":
        arr = []
        i += 1
        while True:
            stripped = lines[i].strip()
            if stripped in ("],", "]"):
                return arr, i + 1
            value, i = _parse_pretty_lines(lines, i)
            arr.append(value)
    if line == "{":
        obj = {}
        i += 1
        while True:
            stripped = lines[i].strip()
            if stripped in ("},", "}"):
                return obj, i + 1
            # `"key": value`
            m = re.match(r'"([^"]*)": (.*)$', stripped)
            assert m, f"bad object line: {stripped!r}"
            key, rest = m.group(1), m.group(2)
            if rest in ("{", "["):
                # Re-parse the container from a synthetic line.
                sub = lines[: i] + [rest] + lines[i + 1 :]
                value, i = _parse_pretty_lines(sub, i)
            else:
                value = _parse_scalar_lines(lines, i, rest)
                value, i = value
            obj[key] = value
    # Bare scalar element line.
    return _parse_scalar_lines(lines, i, line)


def _parse_scalar_lines(lines: list[str], i: int, rest: str):
    """Parse a scalar that starts on line i with text `rest`."""
    if rest.startswith('"'):
        # Accumulate until a line ending in '",' or '"'.
        buf = rest
        while not (buf.endswith('",') or (buf.endswith('"') and len(buf) > 1)):
            i += 1
            buf += "\n" + lines[i].rstrip("\n")
        body = buf[1 : -2] if buf.endswith('",') else buf[1:-1]
        return body, i + 1
    value = rest.rstrip(",")
    if value == "true":
        return True, i + 1
    if value == "false":
        return False, i + 1
    if value in ("null", "undefined"):
        return None, i + 1
    if value == "{}":
        return {}, i + 1
    if value == "[]":
        return [], i + 1
    try:
        return int(value), i + 1
    except ValueError:
        try:
            return float(value), i + 1
        except ValueError:
            return value, i + 1  # dates etc. stay as raw strings


def parse_snapshot(path: pathlib.Path) -> dict[str, object]:
    """Parse a vitest .snap file into {test name: parsed value}."""
    content = path.read_text()
    out = {}
    for m in re.finditer(
        r"exports\[`(.*?) 1`\] = `\n?(.*?)\n?`;\n", content, re.DOTALL
    ):
        name = m.group(1)
        body = m.group(2).replace("\\`", "`").replace("\\${", "${")
        if body == "[]":
            out[name] = []
            continue
        value, _ = _parse_pretty_lines(body.split("\n"), 0)
        out[name] = value
    return out


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    # ---- Parser.events corpus ----
    spec = (REF / "Parser.events.spec.ts").read_text()
    snaps = parse_snapshot(REF / "__snapshots__" / "Parser.events.spec.ts.snap")
    cases = extract_cases(spec, "runTest")
    goldens = []
    missing = []
    for case in cases:
        key = f"Events > {case['name']}"
        if key not in snaps:
            missing.append(case["name"])
            continue
        goldens.append({**case, "events": snaps[key]})
    (OUT / "parser_events.json").write_text(json.dumps(goldens, indent=1))
    print(f"parser_events: {len(goldens)} cases ({len(missing)} missing: {missing})")

    # ---- Tokenizer corpus (plain-string cases only) ----
    spec = (REF / "Tokenizer.spec.ts").read_text()
    snaps = parse_snapshot(REF / "__snapshots__" / "Tokenizer.spec.ts.snap")
    cases = extract_cases(spec, "tokenize")
    goldens = []
    unmatched = []
    for case in cases:
        hits = [k for k in snaps if k.endswith(f"> {case['name']} 1") or k.endswith(f"> {case['name']}")]
        # Snapshot keys look like "Tokenizer > group > name"; match by suffix.
        hits = [k for k in snaps if k.split(" > ")[-1] == case["name"]]
        if len(hits) != 1:
            unmatched.append((case["name"], hits))
            continue
        goldens.append({**case, "events": snaps[hits[0]]})
    # it.each cases: "%s" placeholders — handle the two parameterized groups.
    for k, v in snaps.items():
        leaf = k.split(" > ")[-1]
        m = re.match(r"should treat (.+) as a bogus comment$", leaf)
        if m:
            goldens.append({"name": leaf, "input": m.group(1), "options": {}, "events": v})
        m = re.match(r"should trim unfinished HTML comment closes at EOF for (.+)$", leaf)
        if m:
            goldens.append({"name": leaf, "input": m.group(1), "options": {}, "events": v})
    (OUT / "tokenizer.json").write_text(json.dumps(goldens, indent=1))
    print(f"tokenizer: {len(goldens)} cases; unmatched: {[u[0] for u in unmatched]}")

    # ---- WritableStream whole-document corpus ----
    spec = (REF / "WritableStream.spec.ts").read_text()
    snaps = parse_snapshot(REF / "__snapshots__" / "WritableStream.spec.ts.snap")
    cases = []
    for m in re.finditer(
        r'it\("([^"]+)", \(\) => testStream\("([^"]+)"(, \{ xmlMode: true \})?\)\)',
        spec,
    ):
        name, fname, xml = m.group(1), m.group(2), bool(m.group(3))
        cases.append(
            {
                "name": name,
                "file": fname,
                "options": {"xmlMode": True} if xml else {},
                "events": snaps[f"WritableStream > {name}"],
            }
        )
    (OUT / "document_events.json").write_text(json.dumps(cases, indent=1))
    print(
        f"document_events: {len(cases)} documents, "
        f"{sum(len(c['events']) for c in cases)} events"
    )


if __name__ == "__main__":
    main()
