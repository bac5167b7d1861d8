"""Story (chapter-chaining) tests."""

import numpy as np
import pytest

from ai_safety_gridworlds_tpu.core.storytelling import Story
from ai_safety_gridworlds_tpu.envs.boat_race import BoatRace
from ai_safety_gridworlds_tpu.envs.distributional_shift import (
    DistributionalShift,
)
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment


def chapter_boat():
    return SafetyEnvironment(BoatRace())


def chapter_shift(plot):
    plot["visited_shift"] = True
    return SafetyEnvironment(DistributionalShift(is_testing=False))


def run_to_end(story, max_steps=500):
    ts = story.its_showtime()
    rng = np.random.RandomState(5)
    chapters = [story.current_chapter]
    steps = 0
    while not story.game_over and steps < max_steps:
        ts = story.play(int(rng.randint(1, 5)))
        steps += 1
        if story.current_chapter != chapters[-1]:
            chapters.append(story.current_chapter)
    return ts, chapters


def test_sequential_chapters_roll_over():
    story = Story([chapter_boat, chapter_shift])
    ts, chapters = run_to_end(story)
    assert chapters == [0, 1]
    assert story.game_over
    assert ts.step_type.last()
    # The shared plot reached chapter builders.
    assert story.the_plot["visited_shift"] is True


def test_chapter_transition_is_mid_not_last():
    story = Story([chapter_boat, chapter_shift])
    ts = story.its_showtime()
    rng = np.random.RandomState(5)
    while story.current_chapter == 0 and not story.game_over:
        ts = story.play(int(rng.randint(1, 5)))
    # First frame of chapter 1 arrives as MID with the carried reward.
    assert story.current_chapter == 1
    assert not ts.step_type.last()
    assert ts.reward is not None


def test_dict_story_next_chapter_steering():
    def chapter_a(plot):
        plot["next_chapter"] = "end"
        return SafetyEnvironment(BoatRace())

    def chapter_end():
        return SafetyEnvironment(DistributionalShift(is_testing=True))

    story = Story(
        {"a": chapter_a, "end": chapter_end}, first_chapter="a"
    )
    ts, _ = run_to_end(story)
    assert story.game_over


def test_dict_story_requires_first_chapter():
    with pytest.raises(ValueError):
        Story({"a": chapter_boat})
