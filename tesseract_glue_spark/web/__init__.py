"""Web-document main-content extraction: DOM-heuristic HTML boilerplate
removal and from-scratch PDF text/layout parsing.

The north-star pipeline treats web documents as interleaved text+media:
text spans carry markup (HTML) or typed binary (PDF) whose *main
content* must be isolated from navigation/footer/ad chrome before the
text enters a training corpus. Both kernels here are dependency-free
(stdlib ``html.parser`` + ``zlib``) and run Arrow-batched inside
``mapInPandas`` — never per-row Python UDFs.
"""
