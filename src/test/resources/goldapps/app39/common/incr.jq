def incr: . + 1;
