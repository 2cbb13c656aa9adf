#!/usr/bin/env python3
"""Offline renderer for deploy/chart/graft — no helm binary in this
environment, so this implements exactly the Go-template subset the
chart uses and mimics helm/sprig semantics for it:

  {{/* comments */}}, {{- define "n" -}}...{{- end }}, include "n" .,
  if / else / end (truthiness), with / end (rebinds dot),
  paths (.Values.a.b, .Chart.X, .Release.X, .),
  pipes: quote, nindent N, indent N, toYaml, default ARG,
  whitespace trimming via {{- and -}}.

Output is one multi-doc YAML stream with helm-style "# Source:" lines;
`helm template` on the same chart produces the same documents (modulo
helm's document ordering). Used to produce the committed goldens in
deploy/chart/rendered/, which DeployChartSpec validates end-to-end.

Usage: render_chart.py CHARTDIR [--release NAME] [--set a.b=val ...]
"""
import re, sys, os
import yaml

TAG = re.compile(r"\{\{(-?)(.*?)(-?)\}\}", re.S)


def tokenize(src):
    toks, pos = [], 0
    for m in TAG.finditer(src):
        toks.append(["text", src[pos:m.start()]])
        toks.append(["tag", m.group(2).strip(), m.group(1) == "-",
                     m.group(3) == "-"])
        pos = m.end()
    toks.append(["text", src[pos:]])
    # apply {{- / -}} whitespace trimming to the adjacent text tokens
    for i, t in enumerate(toks):
        if t[0] != "tag":
            continue
        if t[2] and i > 0 and toks[i - 1][0] == "text":
            toks[i - 1][1] = toks[i - 1][1].rstrip(" \t\r\n")
        if t[3] and i + 1 < len(toks) and toks[i + 1][0] == "text":
            toks[i + 1][1] = toks[i + 1][1].lstrip(" \t\r\n")
    return toks


def parse(toks, i, defines, in_block=False):
    """Returns (nodes, next_index, terminator)."""
    nodes = []
    while i < len(toks):
        t = toks[i]
        if t[0] == "text":
            nodes.append(("text", t[1])); i += 1; continue
        tag = t[1]
        if tag.startswith("/*"):
            i += 1; continue
        head = tag.split()[0] if tag.split() else ""
        if head in ("end", "else"):
            if not in_block:
                raise SyntaxError(f"unexpected {head}")
            return nodes, i + 1, head
        if head == "if":
            body, j, term = parse(toks, i + 1, defines, True)
            els = []
            if term == "else":
                els, j, term = parse(toks, j, defines, True)
            assert term == "end", "if without end"
            nodes.append(("if", tag[2:].strip(), body, els)); i = j
        elif head == "with":
            body, j, term = parse(toks, i + 1, defines, True)
            assert term == "end", "with without end"
            nodes.append(("with", tag[4:].strip(), body)); i = j
        elif head == "define":
            name = tag.split()[1].strip('"')
            body, j, term = parse(toks, i + 1, defines, True)
            assert term == "end", "define without end"
            defines[name] = body; i = j
        else:
            nodes.append(("expr", tag)); i += 1
    if in_block:
        raise SyntaxError("unterminated block")
    return nodes, i, None


def truthy(v):
    return not (v is None or v is False or v == "" or v == {} or v == []
                or v == 0)


def to_yaml(v):
    return yaml.safe_dump(v, default_flow_style=False,
                          sort_keys=False).rstrip("\n")


def sprig_indent(n, s):
    pad = " " * n
    return pad + s.replace("\n", "\n" + pad)


class Renderer:
    def __init__(self, ctx, defines):
        self.root, self.defines = ctx, defines

    def atom(self, expr, dot):
        expr = expr.strip()
        if expr == ".":
            return dot
        if expr.startswith('"') and expr.endswith('"'):
            return expr[1:-1]
        if re.fullmatch(r"-?\d+", expr):
            return int(expr)
        if expr.startswith("toYaml "):
            return to_yaml(self.atom(expr[7:], dot))
        if expr.startswith("include "):
            _, name, ctxexpr = expr.split(None, 2)
            body = self.defines[name.strip('"')]
            return self.render(body, self.atom(ctxexpr, dot)).strip("\n")
        if expr.startswith("."):
            v = self.root if expr.split(".")[1] in ("Values", "Chart",
                                                    "Release") else dot
            for part in expr.strip(".").split("."):
                if v is None:
                    return None
                v = v.get(part) if isinstance(v, dict) else None
            return v
        raise SyntaxError(f"unsupported atom: {expr!r}")

    def pipeline(self, expr, dot):
        parts = [p.strip() for p in expr.split("|")]
        val = self.atom(parts[0], dot)
        for f in parts[1:]:
            fw = f.split()
            if fw[0] == "quote":
                val = '"' + str("" if val is None else val)\
                    .replace("\\", "\\\\").replace('"', '\\"') + '"'
            elif fw[0] == "nindent":
                val = "\n" + sprig_indent(int(fw[1]), self.as_str(val))
            elif fw[0] == "indent":
                val = sprig_indent(int(fw[1]), self.as_str(val))
            elif fw[0] == "toYaml":
                val = to_yaml(val)
            elif fw[0] == "default":
                d = self.atom(" ".join(fw[1:]), dot)
                val = val if truthy(val) else d
            else:
                raise SyntaxError(f"unsupported function: {fw[0]}")
        return val

    def as_str(self, v):
        if isinstance(v, str):
            return v
        if isinstance(v, bool):
            return "true" if v else "false"
        if v is None:
            return ""
        if isinstance(v, (dict, list)):
            return to_yaml(v)
        return str(v)

    def render(self, nodes, dot):
        out = []
        for n in nodes:
            if n[0] == "text":
                out.append(n[1])
            elif n[0] == "expr":
                out.append(self.as_str(self.pipeline(n[1], dot)))
            elif n[0] == "if":
                branch = n[2] if truthy(self.pipeline(n[1], dot)) else n[3]
                out.append(self.render(branch, dot))
            elif n[0] == "with":
                v = self.pipeline(n[1], dot)
                if truthy(v):
                    out.append(self.render(n[2], v))
        return "".join(out)


def set_path(d, path, raw):
    val = {"true": True, "false": False}.get(raw, raw)
    keys = path.split(".")
    for k in keys[:-1]:
        d = d.setdefault(k, {})
    d[keys[-1]] = val


def main():
    args = sys.argv[1:]
    chart_dir, release, overrides = None, "graft", []
    i = 0
    while i < len(args):
        if args[i] == "--release":
            release = args[i + 1]; i += 2
        elif args[i] == "--set":
            overrides.append(args[i + 1]); i += 2
        else:
            chart_dir = args[i]; i += 1
    chart = yaml.safe_load(open(os.path.join(chart_dir, "Chart.yaml")))
    values = yaml.safe_load(open(os.path.join(chart_dir, "values.yaml")))
    for ov in overrides:
        path, _, raw = ov.partition("=")
        set_path(values, path, raw)
    ctx = {"Values": values,
           "Chart": {"Name": chart["name"], "Version": chart["version"],
                     "AppVersion": chart.get("appVersion", "")},
           "Release": {"Name": release, "Service": "Helm"}}
    tdir = os.path.join(chart_dir, "templates")
    defines = {}
    parsed = {}
    for fn in sorted(os.listdir(tdir)):
        toks = tokenize(open(os.path.join(tdir, fn)).read())
        parsed[fn], _, _ = parse(toks, 0, defines)
    r = Renderer(ctx, defines)
    docs = []
    for fn in sorted(parsed):
        if fn.startswith("_"):
            continue
        text = r.render(parsed[fn], ctx).strip("\n")
        if not text.strip():
            continue
        # helm prints each yaml document with its own Source line
        for doc in re.split(r"^---$", text, flags=re.M):
            # drop comment-only residue (e.g. a feature-gated template's
            # header comment when the gate is off — helm drops these too)
            body = [l for l in doc.splitlines()
                    if l.strip() and not l.lstrip().startswith("#")]
            if body:
                docs.append(f"---\n# Source: {chart['name']}/templates/"
                            f"{fn}\n{doc.strip(chr(10))}\n")
    sys.stdout.write("".join(docs))


if __name__ == "__main__":
    main()
