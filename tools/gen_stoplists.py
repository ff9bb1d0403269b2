#!/usr/bin/env python3
"""Extract the zh/ja/th stop word DATA lists (stopwords-iso, MIT; vendored
by the reference at html_extractors/utils/{zh,ja,th}_stopwords.py) into
plain one-word-per-line resource files consumed by graft.text.StopLists.
Data only — no code is ported by this script."""
import ast, pathlib

SRC = "/root/reference/nemo_curator/stages/text/download/html_extractors/utils"
OUT = pathlib.Path("src/main/resources/stopwords")
OUT.mkdir(parents=True, exist_ok=True)
for lang in ["zh", "ja", "th"]:
    tree = ast.parse(open(f"{SRC}/{lang}_stopwords.py", encoding="utf-8").read())
    words = None
    for node in ast.walk(tree):
        if isinstance(node, ast.Call) and getattr(node.func, "id", "") == "frozenset":
            words = [ast.literal_eval(e) for e in node.args[0].elts]
    assert words, lang
    out = OUT / f"{lang}.txt"
    out.write_text("\n".join(sorted(set(words))) + "\n", encoding="utf-8")
    print(lang, len(set(words)), "words ->", out)
