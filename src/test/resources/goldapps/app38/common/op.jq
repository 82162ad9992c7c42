def decr: . - 1;
def incr: . + 1;
