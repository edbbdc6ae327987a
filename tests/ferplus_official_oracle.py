"""Test-only oracle: independent transliteration of FERPlus label cleaning.

This is a line-by-line transliteration of ``_process_data`` from the
official FERPlus release (Barsoum, Zhang, Canton Ferrer, Zhang, ICMI
2016, arXiv:1608.01041; public repository ``microsoft/FERPlus``,
``src/ferplus.py``), written INDEPENDENTLY of
``mcncrossmodalemotions_tpu.data.ferplus.process_votes_official`` so a
differential fuzz between the two can catch a misread quirk that
hand-picked vote tables miss (round-4 VERDICT missing #2 / next #4).

Transliteration notes (kept deliberately un-idiomatic to mirror the
original's control flow):

- The outlier-removal loop re-evaluates ``sum(emotion_raw)`` INSIDE the
  condition, so zeroing early columns lowers the threshold for later
  ones.
- The probability/crossentropy greedy take can accept several tied
  columns in one inner ``for`` pass, so ``count`` may overshoot 3.
- On taking unknown/NF (i >= 8) with real emotions already leading, the
  official code rolls back ``emotion[i]`` and ``count`` — NOT
  ``sum_part`` (irrelevant to control flow: ``valid_emotion`` ends the
  while loop) — so an unknown evicted at count 4 leaves count == 3 and
  the sample SURVIVES the ``count > 3`` discard.
- The final normalisation divides by ``sum(emotion)``: an all-zero
  result (possible in ``multi_target`` when outlier removal empties the
  row) raises ZeroDivisionError in the original. Callers of the oracle
  must treat that as "official crashes here".

Provenance caveat: this environment has no network; the transliteration
is from the author's knowledge of the public source, not a live copy.
``cli verify-release`` is the first-networked-contact battery where the
real dataset pins these semantics.
"""

import numpy as np


def official_process_data(emotion_raw, mode):
    emotion_raw = [float(x) for x in emotion_raw]
    size = len(emotion_raw)
    emotion_unknown = [0.0] * size
    emotion_unknown[-2] = 1.0

    # remove emotions with a single vote (outlier removal)
    for i in range(size):
        if emotion_raw[i] < 1.0 + sum(emotion_raw) * 0.01:
            emotion_raw[i] = 0.0

    sum_list = sum(emotion_raw)
    emotion = [0.0] * size

    if mode == 'majority':
        # find the peak value of the emo_raw list
        maxval = max(emotion_raw)
        if maxval > 0.5 * sum_list:
            emotion[int(np.argmax(emotion_raw))] = maxval
        else:
            emotion = emotion_unknown   # force setting as unknown
    elif (mode == 'probability') or (mode == 'crossentropy'):
        sum_part = 0
        count = 0
        valid_emotion = True
        while sum_part < 0.75 * sum_list and count < 3 and valid_emotion:
            maxval = max(emotion_raw)
            for i in range(size):
                if emotion_raw[i] == maxval:
                    emotion[i] = maxval
                    emotion_raw[i] = 0
                    sum_part += emotion[i]
                    count += 1
                    if i >= 8:  # unknown or non-face share the max votes
                        valid_emotion = False
                        if sum(emotion) > maxval:  # other emotions lead
                            emotion[i] = 0
                            count -= 1
                        break
        if sum(emotion) <= 0.5 * sum_list or count > 3:
            # less than 50% of the votes integrated, or too many emotions
            emotion = emotion_unknown   # force setting as unknown
    elif mode == 'multi_target':
        threshold = 0.3
        for i in range(size):
            if emotion_raw[i] >= threshold * sum_list:
                emotion[i] = emotion_raw[i]
        if max(emotion) < 0.5 * sum_list:
            emotion = emotion_unknown   # force setting as unknown
    else:
        raise ValueError(mode)

    return [float(i) / sum(emotion) for i in emotion]
