"""Language metrics: BLEU, ROUGE-L, CIDEr, METEOR + PTB tokenizer.

Replaces the reference's vendored coco-caption/cider packages (Python) and the
three Java tools (PTBTokenizer, METEOR, SPICE — SURVEY.md §2.4) with Python
implementations plus C++ natives (native/) for the hot/tool paths."""
